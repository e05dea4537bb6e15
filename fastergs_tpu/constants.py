"""Compile-time rasterizer constants.

TPU-native analog of the reference's constexpr config namespace
(reference: FasterGSCudaBackend/.../rasterization/include/rasterization_config.h:7-57).
Instead of C++ constexpr requiring recompilation, these live in a frozen dataclass
that is closed over at JAX trace time — changing a value triggers a re-trace,
preserving the "compile-time constant" semantics the reference relies on.
"""

from __future__ import annotations

import dataclasses
import math


# Truncation presets: (min_alpha_threshold_rcp, max_power_threshold)
# reference: rasterization_config.h:18-44
_TRUNCATION_PRESETS = {
    0: (255.0, math.log(255.0)),            # 3.33 sigma (original 3DGS)
    1: (math.e, 1.0),                        # 1 sigma
    2: (math.exp(2.0), 2.0),                 # 2 sigma
    3: (math.exp(4.5), 4.5),                 # 3 sigma
    4: (math.exp(8.0), 8.0),                 # 4 sigma
}


@dataclasses.dataclass(frozen=True)
class RasterizerConstants:
    """Numerical contract of the rasterizer (reference: rasterization_config.h)."""

    # screen-space dilation added to the cov2d diagonal
    dilation: float = 0.3
    dilation_proper_antialiasing: float = 0.1
    # detaching the AA convolution factor from cov2d stabilizes gradients
    # (reference: rasterization_config.h:12, kernels_backward.cuh:137-159)
    detach_dilation_proper_antialiasing_from_cov2d: bool = True
    min_cov2d_determinant: float = 1e-6
    # opacity inside the exponential-threshold logic (3DGS style) vs separate property
    original_opacity_interpretation: bool = True
    one_minus_alpha_eps: float = 1e-6
    transmittance_threshold: float = 1e-4
    # truncation preset (reference: rasterization_config.h:18)
    truncation_mode: int = 0
    # raster tiling
    tile_width: int = 16
    tile_height: int = 16
    # debug-mode input validation (the reference's CHECK_INPUT/CHECK_CUDA
    # analog, utils/torch_utils.h:14-19 + config::debug switches): trace-time
    # shape/dtype checks on every rasterizer entry; compiled out when False
    debug: bool = False

    def __post_init__(self):
        if self.truncation_mode in (1, 2, 3) and self.original_opacity_interpretation:
            raise ValueError(
                f'truncation mode {self.truncation_mode} requires the revised opacity '
                'interpretation (original_opacity_interpretation=False)'
            )
        if self.truncation_mode not in _TRUNCATION_PRESETS:
            raise ValueError(f'invalid truncation mode {self.truncation_mode}')

    @property
    def min_alpha_threshold_rcp(self) -> float:
        return _TRUNCATION_PRESETS[self.truncation_mode][0]

    @property
    def min_alpha_threshold(self) -> float:
        return 1.0 / _TRUNCATION_PRESETS[self.truncation_mode][0]

    @property
    def max_power_threshold(self) -> float:
        return _TRUNCATION_PRESETS[self.truncation_mode][1]

    @property
    def pixels_per_tile(self) -> int:
        return self.tile_width * self.tile_height


DEFAULT_CONSTANTS = RasterizerConstants()

# Instance-capacity alignment quantum. Capacities must satisfy every
# kernel's grid alignment (fill: %1024, blend stream / segreduce: %512);
# 2^16 additionally bounds the number of DISTINCT buffer lengths the
# watermark-growth policy can produce, keeping sort recompiles rare (each
# new length compiles a fresh wide variadic sort, ~4-12 s on v5e). The
# reference sizes its instance buffer exactly per frame
# (forward.cu:99-102); on TPU shapes are static, so this quantum is the
# static-shape analog: cap = demand rounded up, NOT the next power of two
# (pow2 rounding cost up to +100% padding on every linear-in-I stage —
# measured 44% padding at garden scale in round 4).
CAP_ALIGN = 1 << 16


def round_up_capacity(n: int) -> int:
    """Smallest CAP_ALIGN multiple >= n (minimum one quantum)."""
    return max((int(n) + CAP_ALIGN - 1) // CAP_ALIGN * CAP_ALIGN, CAP_ALIGN)


def sort_pad_len(n: int) -> int:
    """Length to pad a wide variadic TPU sort to.

    XLA's TPU sort compiles in seconds at power-of-two and CAP_ALIGN-
    multiple lengths, but takes MINUTES for many-operand sorts at
    arbitrary lengths (measured round 2: 12 operands at 1,150,976 -> 92 s
    vs 11 s at 2^21; round 4: 4-12 s at 1,310,720 = 20*2^16). Aligned
    capacities sort at their exact length; small test-scale lengths pad
    to the next power of two (cheap), odd large lengths to the next
    CAP_ALIGN multiple.
    """
    n = int(n)
    if n % CAP_ALIGN == 0:
        return n
    if n < CAP_ALIGN:
        return 1 << max(n - 1, 1).bit_length()
    return round_up_capacity(n)

# SH basis constants, degree 0-3 (reference: sh_utils.cuh:7-30; standard
# real spherical harmonics coefficients used by all 3DGS implementations).
SH_C0 = 0.28209479177387814
SH_C1 = 0.48860251190291987
SH_C2 = (1.0925484305920792, 0.94617469575755997, 0.31539156525251999,
         0.54627421529603959, 1.8923493915151202)
SH_C3 = (0.59004358992664352, 1.7701307697799304, 2.8906114426405538,
         0.45704579946446572, 2.2852289973223288, 1.865881662950577,
         1.1195289977703462, 1.4453057213202769, 3.5402615395598609,
         4.5704579946446566, 5.597644988851731)
