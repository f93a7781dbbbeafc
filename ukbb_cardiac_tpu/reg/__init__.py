"""JAX B-spline FFD registration — replaces MIRTK + average_3d_ffd."""

from ukbb_cardiac_tpu.reg.bspline import (
    bspline_dense_field,
    bspline_point_disp,
    cubic_bspline,
    fit_lattice_to_field,
    lattice_shape,
)
from ukbb_cardiac_tpu.reg.losses import bending_energy, nmi, ssd
from ukbb_cardiac_tpu.reg.parcfg import load_par_cfg
from ukbb_cardiac_tpu.reg.register import (
    RegConfig,
    average_fields,
    compose_chain,
    compose_fields,
    invert_field,
    gaussian_blur,
    make_register_batch,
    make_register_pair,
    total_field,
    transform_points,
    warp_image,
)
