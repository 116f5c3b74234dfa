from .nms import NmsOutput, non_max_suppression  # noqa: F401
from .inference import YoloInferenceOutput, yolo_inference  # noqa: F401
from .matcher import MatcherConfig, MatchingOutput, match_targets  # noqa: F401
from .yolo_loss import LossConfig, LossOutput, yolo_loss  # noqa: F401
