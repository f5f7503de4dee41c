from .awgn import ChannelStats, make_trial_step, make_two_stage_decoder, noise_sigma
from .waterfall import DEFAULT_SNRS_TC512, SnrPoint, waterfall

__all__ = ["ChannelStats", "make_trial_step", "make_two_stage_decoder", "noise_sigma",
           "SnrPoint", "waterfall", "DEFAULT_SNRS_TC512"]
