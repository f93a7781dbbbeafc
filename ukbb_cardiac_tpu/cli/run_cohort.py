"""Whole-cohort end-to-end processing with cross-stage overlap.

Replaces the reference's stage-by-stage cohort walks — deploy over all
subjects, then each eval script over all subjects, optionally sharded by
hand with ``--start_idx/--end_idx`` (``demo_pipeline.py:63-122``,
``eval_strain_sax.py:26-34``) — with one command that runs

    segmentation → ventricular volumes → wall thickness → strain

per subject over a worker pool: subject N+1's device work (segmentation,
FFD registration) runs while subject N's host post-processing (contour
warps, VTK/CSV writes) completes.  Outputs per subject match the
individual CLIs file-for-file; aggregate CSVs are written to
``--output_dir`` in the same schemas.

With any of ``--model_path_la_2ch/--model_path_la_4ch/--model_path_seg4/
--model_path_ao`` the per-subject chain extends to the COMPLETE
``demo_pipeline.py`` (LA deploys → atrial volumes → LA strain → aortic
deploy → aortic areas); ``--pressure_csv`` supplies the Vicorder central
pulse pressures for distensibility (``eval_aortic_area.py:40-44``).
"""

from __future__ import annotations

import argparse
import json


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--data_dir", metavar="dir_name", required=True)
    parser.add_argument("--model_path", metavar="path", required=True,
                        help="FCN checkpoint: TF prefix or converted .npz")
    parser.add_argument("--output_dir", metavar="dir_name", required=True,
                        help="Aggregate CSV directory")
    parser.add_argument("--workers", type=int, default=3)
    parser.add_argument("--bf16", action="store_true",
                        help="bf16 activations for segmentation")
    parser.add_argument("--eval_dice", action="store_true")
    parser.add_argument("--force", action="store_true",
                        help="Re-segment even when seg_sa.nii.gz exists")
    parser.add_argument("--manifest", metavar="json_name", default="",
                        help="Write the fleet manifest (per-subject "
                             "status/seconds) to this JSON file")
    parser.add_argument("--mesh_devices", type=int, default=0,
                        help="Shard each subject's strain registration "
                             "over this many chips (0 = one)")
    parser.add_argument("--model_path_la_2ch", metavar="path", default="")
    parser.add_argument("--model_path_la_4ch", metavar="path", default="")
    parser.add_argument("--model_path_seg4", metavar="path", default="")
    parser.add_argument("--model_path_ao", metavar="path", default="")
    parser.add_argument("--pressure_csv", metavar="csv_name", default="",
                        help="UKB blood-pressure spreadsheet for aortic "
                             "distensibility (fields 12678-2.0/2.1)")
    parser.add_argument("--start_idx", type=int, default=0,
                        help="First subject index (sorted order) — the "
                             "reference eval scripts' manual sharding "
                             "flags (eval_strain_sax.py:26-34), kept for "
                             "multi-host splits")
    parser.add_argument("--end_idx", type=int, default=-1,
                        help="One past the last subject index (-1 = all)")
    args = parser.parse_args(argv)

    import jax.numpy as jnp

    from ukbb_cardiac_tpu.infer.deploy import load_segmentation_model
    from ukbb_cardiac_tpu.infer.engine import InferenceEngine
    from ukbb_cardiac_tpu.parallel.cohort import (run_cohort_full,
                                                  run_cohort_sa)

    dtype = jnp.bfloat16 if args.bf16 else None

    def slice_engine(path):
        return InferenceEngine(load_segmentation_model(path, dtype))

    engine = slice_engine(args.model_path)
    mesh = None
    if args.mesh_devices > 1:
        from ukbb_cardiac_tpu.parallel import make_mesh
        mesh = make_mesh(args.mesh_devices)

    full = any((args.model_path_la_2ch, args.model_path_la_4ch,
                args.model_path_seg4, args.model_path_ao))
    if args.pressure_csv and not args.model_path_ao:
        parser.error("--pressure_csv is only used by the aortic stage; "
                     "pass --model_path_ao as well")
    if full:
        from ukbb_cardiac_tpu.infer.deploy_ao import load_aortic_engine
        engines = {"sa": engine}
        for key, path in (("la_2ch", args.model_path_la_2ch),
                          ("la_4ch", args.model_path_la_4ch),
                          ("seg4", args.model_path_seg4)):
            if path:
                engines[key] = slice_engine(path)
        if args.model_path_ao:
            engines["ao"] = load_aortic_engine(
                args.model_path_ao, dtype or jnp.float32)
        pressure = None
        if args.pressure_csv:
            from ukbb_cardiac_tpu.phenotype.aorta import \
                load_central_pulse_pressure
            pressure = load_central_pulse_pressure(args.pressure_csv)
        result = run_cohort_full(args.data_dir, engines,
                                 workers=args.workers, mesh=mesh,
                                 pressure=pressure,
                                 eval_dice=args.eval_dice,
                                 output_dir=args.output_dir,
                                 skip_existing_seg=not args.force,
                                 start_idx=args.start_idx,
                                 end_idx=args.end_idx)
    else:
        result = run_cohort_sa(args.data_dir, engine,
                               workers=args.workers,
                               mesh=mesh, eval_dice=args.eval_dice,
                               output_dir=args.output_dir,
                               skip_existing_seg=not args.force,
                               start_idx=args.start_idx,
                               end_idx=args.end_idx)
    n_ok = len(result.fleet.succeeded)
    print(f"cohort: {n_ok} succeeded, {len(result.fleet.failed)} failed, "
          f"{len(result.fleet.skipped)} skipped in "
          f"{result.wall_seconds:.1f}s "
          f"({result.subjects_per_s:.3f} subjects/s)")
    if args.manifest:
        with open(args.manifest, "w") as f:
            json.dump({**result.fleet.to_manifest(),
                       "wall_seconds": result.wall_seconds,
                       "stage_seconds": result.stage_seconds}, f, indent=2)
    return 0 if not result.fleet.failed else 1


if __name__ == "__main__":
    raise SystemExit(main())
