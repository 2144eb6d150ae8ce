from .heatmap import (  # noqa: F401
    apply_affine,
    distort_projection_fisheye,
    gen_trans_from_patch,
    soft_argmax_2d,
    soft_argmax_3d,
)
from .resample import (  # noqa: F401
    bbox_to_corners,
    crop_and_resize,
    crop_and_resize_np,
    crop_with_normalized_box_np,
    crop_with_square_box_np,
    expand_bbox_square,
    scale_rotate_img,
)
from .fused_block import fused_swin_block  # noqa: F401
from .window_attention import fused_window_attention, xla_window_attention  # noqa: F401
