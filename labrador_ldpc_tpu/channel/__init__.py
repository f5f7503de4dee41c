from .awgn import (
    ChannelStats,
    default_llr_scale,
    make_trial_step,
    make_two_stage_decoder,
    noise_sigma,
    quantize_llrs,
)
from .waterfall import DEFAULT_SNRS_TC512, SnrPoint, waterfall

__all__ = ["ChannelStats", "make_trial_step", "make_two_stage_decoder", "noise_sigma",
           "quantize_llrs", "default_llr_scale",
           "SnrPoint", "waterfall", "DEFAULT_SNRS_TC512"]
