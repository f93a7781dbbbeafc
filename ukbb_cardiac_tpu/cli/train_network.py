"""CLI twin of ``common/train_network.py`` — SA/LA FCN training.

Same flags (``train_network.py:27-54``) on the JAX/optax trainer
(``train/sa.py``), plus ``--mesh_devices`` for data-parallel training
over a TPU mesh.
"""

from __future__ import annotations

import argparse

from ukbb_cardiac_tpu.train.sa import SATrainConfig, train


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--seq_name", choices=["sa", "la_2ch", "la_4ch"],
                        default="sa")
    parser.add_argument("--image_size", type=int, default=192)
    parser.add_argument("--train_batch_size", type=int, default=2)
    parser.add_argument("--validation_batch_size", type=int, default=2)
    parser.add_argument("--train_iteration", type=int, default=50000)
    parser.add_argument("--num_filter", type=int, default=16)
    parser.add_argument("--num_level", type=int, default=5)
    parser.add_argument("--learning_rate", type=float, default=1e-3)
    parser.add_argument("--dataset_dir", required=True)
    parser.add_argument("--checkpoint_dir", default="checkpoints")
    parser.add_argument("--log_dir", default="logs")
    parser.add_argument("--mesh_devices", type=int, default=0,
                        help="0 = single device; N = data-parallel mesh.")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--device_augment", action="store_true",
                        help="Run the affine augmentation inside the "
                             "jitted step (TPU path) instead of on host.")
    parser.add_argument("--batch_slices", type=int, default=0,
                        help="Fixed slices per batch via a slice pool "
                             "(static shape; 0 = reference per-subject "
                             "batches of varying slice count).")
    parser.add_argument("--steps_per_dispatch", type=int, default=1,
                        help="Optimizer steps per device dispatch "
                             "(lax.scan; needs --batch_slices; pick a "
                             "divisor of the validation cadence).")
    parser.add_argument("--resume_from", default="",
                        help="Checkpoint bundle to resume from.")
    parser.add_argument("--cache_gb", type=float, default=0.0,
                        help="LRU cache of decoded subjects, GiB "
                             "(0 = re-decode every draw, as the "
                             "reference does; 4 holds ~1000 subjects).")
    parser.add_argument("--bf16", action="store_true",
                        help="bf16 mixed-precision training (activations "
                             "bf16; params/BN/logits/loss f32).")
    parser.add_argument("--compact_transfer", action="store_true",
                        help="Ship batches as f16 images + uint8 labels "
                             "(2.7x fewer host->device bytes; labels "
                             "exact, images rounded ~5e-4).")
    args = parser.parse_args(argv)

    cfg = SATrainConfig(
        seq_name=args.seq_name, image_size=args.image_size,
        train_batch_size=args.train_batch_size,
        validation_batch_size=args.validation_batch_size,
        train_iteration=args.train_iteration, num_filter=args.num_filter,
        num_level=args.num_level, learning_rate=args.learning_rate,
        dataset_dir=args.dataset_dir, checkpoint_dir=args.checkpoint_dir,
        log_dir=args.log_dir, seed=args.seed, mesh_devices=args.mesh_devices,
        device_augment=args.device_augment, batch_slices=args.batch_slices,
        steps_per_dispatch=args.steps_per_dispatch, cache_gb=args.cache_gb,
        bf16=args.bf16, compact_transfer=args.compact_transfer)
    train(cfg, resume_from=args.resume_from or None)


if __name__ == "__main__":
    main()
