from worldtpu.ops.interp import interp1, interp1q  # noqa: F401
from worldtpu.ops.filters import (  # noqa: F401
    nuttall_window,
    nuttall_window_ragged,
    iir_affine_scan,
    biquad_zero_lag,
    decimate,
    dc_correction,
    linear_smoothing,
)
from worldtpu.ops.misc import (  # noqa: F401
    fast_fftfilt,
    matlab_std,
    matlab_round,
    fftshift,
    histc,
    diff,
)
from worldtpu.ops.fftutil import (  # noqa: F401
    get_suitable_fft_size,
    fft_size_for_cheaptrick,
    f0_floor_for_cheaptrick,
    minimum_phase,
)
