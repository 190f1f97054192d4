"""Top-level CCD pipelines (reference: ``cuda/ccd.*``, ``cuda/ipc_ccd_strategy.*``)."""

from scalable_ccd_tpu.pipeline.ccd import CCDStats, ccd, ipc_ccd_strategy

__all__ = ["CCDStats", "ccd", "ipc_ccd_strategy"]
