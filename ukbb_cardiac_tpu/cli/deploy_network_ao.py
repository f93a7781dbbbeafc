"""CLI twin of ``common/deploy_network_ao.py`` — aortic cine deploy.

Same flags (``deploy_network_ao.py:25-49``) plus ``--window full|compat``:
'full' runs the TPU-native whole-sequence ConvLSTM scan; 'compat'
reproduces the reference's sliding circular window blending exactly.
"""

from __future__ import annotations

import argparse

from ukbb_cardiac_tpu.cli._common import add_bool_flag
from ukbb_cardiac_tpu.infer.deploy_ao import deploy_dataset_ao


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--seq_name", default="ao", help="Sequence name.")
    parser.add_argument("--data_dir", default="", required=False)
    parser.add_argument("--model_path", default="",
                        help="Path to the saved trained model bundle (.npz).")
    add_bool_flag(parser, "process_seq", True, "Process a time sequence of images.")
    add_bool_flag(parser, "save_seg", True, "Save segmentation.")
    add_bool_flag(parser, "z_score", True, "Z-score intensity normalisation.")
    parser.add_argument("--weight_R", type=int, default=5,
                        help="Radius R of the temporal weighting window.")
    parser.add_argument("--weight_r", type=float, default=0.0,
                        help="Power r of the temporal weighting window.")
    parser.add_argument("--time_step", type=int, default=1,
                        help="Window stride in compat mode.")
    parser.add_argument("--window", choices=["full", "compat"], default="full",
                        help="'full': one lax.scan over the whole cine; "
                             "'compat': the reference's sliding window.")
    add_bool_flag(parser, "bf16", False,
                  "bf16 activations (params/BN/logits stay f32).")
    parser.add_argument("--trace_dir", default="",
                        help="Write a jax.profiler device trace here "
                             "(view with TensorBoard/XProf).")
    args = parser.parse_args(argv)

    from ukbb_cardiac_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    model_path = args.model_path
    if not model_path.endswith(".npz"):
        from ukbb_cardiac_tpu.ckpt.tf_reader import convert_tf_checkpoint
        model_path = convert_tf_checkpoint(model_path)

    import jax.numpy as jnp
    compute_dtype = jnp.bfloat16 if args.bf16 else jnp.float32

    from ukbb_cardiac_tpu.utils import device_trace
    with device_trace(args.trace_dir):
        deploy_dataset_ao(model_path, args.data_dir, seq_name=args.seq_name,
                          z_score=args.z_score, save_seg=args.save_seg,
                          window=args.window, weight_R=args.weight_R,
                          weight_r=args.weight_r, time_step=args.time_step,
                          process_seq=args.process_seq,
                          compute_dtype=compute_dtype)


if __name__ == "__main__":
    main()
