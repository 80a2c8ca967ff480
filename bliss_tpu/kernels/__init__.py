from bliss_tpu.kernels.fused_stats import fused_sample_stats

__all__ = ["fused_sample_stats"]
