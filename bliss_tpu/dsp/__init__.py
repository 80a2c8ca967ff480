from bliss_tpu.dsp.framing import frame_signal
from bliss_tpu.dsp.iir import lfilter_blocked, lfilter_scan
from bliss_tpu.dsp.boxfilter import box_sum_same
from bliss_tpu.dsp.intops import c_div

__all__ = [
    "frame_signal",
    "lfilter_blocked",
    "lfilter_scan",
    "box_sum_same",
    "c_div",
]
