from .iou_pallas import pairwise_iou_pallas  # noqa: F401
from .fused_conv1x1 import fused_conv1x1_mish  # noqa: F401
