from .boxes import (  # noqa: F401
    area,
    box_iou_pairwise,
    ciou,
    closure_tlbr,
    cycxhw_to_tlbr,
    diou,
    giou,
    hausdorff_distance,
    intersect_area,
    iou,
    tlbr_to_cycxhw,
)
from .transform import Transform  # noqa: F401
