from mlsp_tpu.utils.logging import IOStream
from mlsp_tpu.utils import metrics
from mlsp_tpu.utils import checkpoint

__all__ = ["IOStream", "metrics", "checkpoint"]
