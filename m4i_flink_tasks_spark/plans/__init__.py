"""Batch dataflow plans composing the operator kernels into the
reference's job-level semantics (SURVEY §3.3): the ``foreachBatch``
bodies a streaming deployment runs per micro-batch."""

from .synchronize_plan import synchronize_batch, synchronize_batch_to_fixpoint

__all__ = ["synchronize_batch", "synchronize_batch_to_fixpoint"]
