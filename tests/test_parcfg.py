"""Tests for the MIRTK par/*.cfg compatibility parser (reg/parcfg.py).

The fixture texts reproduce the *format* of the reference's parameter
files (``par/ffd_cine_2d_motion.cfg``, ``par/ffd_aortic_motion.cfg``) so
a user's tuned MIRTK config loads drop-in into :class:`RegConfig`.
"""

import pytest

from ukbb_cardiac_tpu.reg.parcfg import load_par_cfg, parse_energy
from ukbb_cardiac_tpu.reg.register import RegConfig

CINE_CFG = """\
#
# Registration parameters
#

No. of resolution levels          = 3
Energy function                   = SSD(I1, I2 o T) + 1e-1 BE
Transformation model              = FFD
Multi-level transformation        = Sum
Epsilon                           = 1e-3
Maximum streak of rejected steps  = 3
Control point spacing             = 10
Padding value                     = -1

#
# Registration parameters for resolution level 1
#

Resolution level                  = 1
Blurring                          = 0
Resolution of image 1             = 0 0 0
Resolution of image 2             = 0 0 0
Maximum length of steps           = 1
Minimum length of steps           = 0.1
"""

AORTIC_CFG = """\
No. of resolution levels          = 1
Energy function                   = NMI(I1, I2 o T) + 1e-4BE
Transformation model              = FFD
Multi-level transformation        = Sum
Epsilon                           = 1e-4
Maximum streak of rejected steps  = 2
Control point spacing             = 10
Padding value                     = -1
"""


def test_parse_energy():
    assert parse_energy("SSD(I1, I2 o T) + 1e-1 BE") == ("ssd", 0.1)
    # the aortic cfg has no space before BE
    assert parse_energy("NMI(I1, I2 o T) + 1e-4BE") == ("nmi", 1e-4)
    assert parse_energy("SSD(I1, I2 o T)") == ("ssd", 0.0)
    with pytest.raises(ValueError):
        parse_energy("LNCC(I1, I2 o T)")


def test_load_cine_cfg(tmp_path):
    p = tmp_path / "ffd_cine_2d_motion.cfg"
    p.write_text(CINE_CFG)
    cfg, ignored = load_par_cfg(str(p))
    ref = RegConfig.cine_2d_motion()
    assert cfg.levels == 3 == ref.levels
    assert cfg.metric == "ssd" == ref.metric
    assert cfg.be_weight == pytest.approx(0.1) == ref.be_weight
    assert cfg.spacing == 10 == ref.spacing
    assert cfg.padding_value == -1.0
    # optimiser internals and per-level pyramid keys are accepted but
    # reported, never silently dropped
    joined = "\n".join(ignored)
    assert "Epsilon" in joined and "Blurring" in joined


def test_load_aortic_cfg(tmp_path):
    p = tmp_path / "ffd_aortic_motion.cfg"
    p.write_text(AORTIC_CFG)
    # keep the NMI operating point's iteration budget via base
    cfg, _ = load_par_cfg(str(p), base=RegConfig.aortic_motion())
    assert cfg.levels == 1
    assert cfg.metric == "nmi"
    assert cfg.be_weight == pytest.approx(1e-4)
    assert cfg.iters == RegConfig.aortic_motion().iters


def test_unknown_top_level_key_raises(tmp_path):
    p = tmp_path / "bad.cfg"
    p.write_text("Frobnication factor = 2\n")
    with pytest.raises(ValueError, match="unknown MIRTK parameter"):
        load_par_cfg(str(p))


def test_non_ffd_model_raises(tmp_path):
    p = tmp_path / "rigid.cfg"
    p.write_text("Transformation model = Rigid\n")
    with pytest.raises(ValueError, match="only FFD"):
        load_par_cfg(str(p))


def test_reference_par_files_load_if_present():
    """When the upstream checkout is available, its three shipped cfg
    files must load without error (format drift guard)."""
    import glob
    import os

    paths = glob.glob("/root/reference/par/*.cfg")
    if not paths:
        pytest.skip("reference checkout not present")
    for path in paths:
        cfg, _ = load_par_cfg(str(path))
        assert cfg.levels in (1, 3)
        assert cfg.metric in ("ssd", "nmi")
        assert os.path.basename(path)  # touch path for readability
