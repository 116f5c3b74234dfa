from .iou_pallas import pairwise_iou_pallas  # noqa: F401
