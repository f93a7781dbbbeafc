"""Write the canonical MIRTK-golden phantom subject (see README.md).

Deterministic: the same bytes on every machine, so only MIRTK's OUTPUT
CSVs need to be recorded as the fixture.  Pure numpy + this repo's own
NIfTI writer — runs anywhere the repo checks out (no TPU, no nibabel).

Usage: python tests/fixtures/mirtk_golden/make_inputs.py <out_dir>
"""

import os
import sys

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tests"))

# the canonical geometry — changing ANY of these invalidates a recorded
# fixture (the test re-generates the subject with these exact values)
SHAPE = dict(X=128, Y=128, Z=6, T=20)
PHANTOM = dict(r_lv=20.0, wall=7.0, amp=0.3, noise=0.03,
               incompressible=True)
SEED = 42
PIXDIM = (1.8, 1.8, 10.0)
DT = 0.04


def write_subject(out_dir: str):
    from phantom import sax_phantom

    from ukbb_cardiac_tpu.io import nifti

    os.makedirs(out_dir, exist_ok=True)
    X, Y, Z, T = SHAPE["X"], SHAPE["Y"], SHAPE["Z"], SHAPE["T"]
    image, seg = sax_phantom(X, Y, Z, T, rng=np.random.RandomState(SEED),
                             **PHANTOM)
    affine = np.diag([-PIXDIM[0], -PIXDIM[1], PIXDIM[2], 1.0])
    affine[:3, 3] = (X * PIXDIM[0] / 2, Y * PIXDIM[1] / 2,
                     -Z * PIXDIM[2] / 2)
    hdr = nifti.Nifti1Header()
    hdr.dim[0] = 4
    hdr.dim[1:5] = image.shape
    hdr.pixdim[1:5] = PIXDIM + (DT,)
    nifti.save(nifti.Nifti1Image(image.astype(np.int16), affine, hdr),
               os.path.join(out_dir, "sa.nii.gz"))
    nifti.save(nifti.Nifti1Image(seg.astype(np.int16), affine, hdr.copy()),
               os.path.join(out_dir, "seg_sa.nii.gz"))
    hdr3 = nifti.Nifti1Header()
    hdr3.dim[0] = 3
    hdr3.dim[1:4] = seg.shape[:3]
    hdr3.pixdim[1:4] = PIXDIM
    nifti.save(nifti.Nifti1Image(seg[:, :, :, 0].astype(np.int16), affine,
                                 hdr3),
               os.path.join(out_dir, "seg_sa_ED.nii.gz"))
    return out_dir


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "mirtk_subject"
    write_subject(out)
    print(f"canonical subject written to {out}")
