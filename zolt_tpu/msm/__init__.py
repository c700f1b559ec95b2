from .pippenger import msm, msm_oracle

__all__ = ["msm", "msm_oracle"]
