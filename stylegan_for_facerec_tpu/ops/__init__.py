from .fused_act import (bias_act, clamp_gain, fused_bias_act_pallas,
                        fused_leaky_relu)
from .image import (ccrop_tta, center_crop, hflip, normalize_pm1,
                    quantize_uint8_roundtrip, random_crop, random_hflip,
                    resize_bilinear)
from .modconv import modulated_conv2d, modulated_conv2d_grouped
from .resample import smooth_downsample, smooth_upsample
from .upfirdn2d import make_resample_kernel, upfirdn2d, upfirdn2d_ref

__all__ = [
    "bias_act", "clamp_gain", "fused_bias_act_pallas", "fused_leaky_relu",
    "ccrop_tta", "center_crop", "hflip", "normalize_pm1",
    "quantize_uint8_roundtrip", "random_crop", "random_hflip",
    "resize_bilinear", "modulated_conv2d", "modulated_conv2d_grouped",
    "smooth_downsample", "smooth_upsample", "make_resample_kernel",
    "upfirdn2d", "upfirdn2d_ref",
]
