from .conv import conv2d_apply, conv_bn_apply, conv_bn_init, deconv_bn_apply, deconv_bn_init  # noqa: F401
from .norm import batch_norm_apply, batch_norm_init, clamp_running_var, fold_batch_norm  # noqa: F401
from .blocks import dark_csp_apply, dark_csp_init, spp_csp_apply, spp_csp_init  # noqa: F401
from .detect import DenseDetection, MergedDetection, detect_decode, merge_detections  # noqa: F401
from .simple import concat2d, dynamic_pad2d, max_pool2d, sum2d, upsample2d  # noqa: F401
