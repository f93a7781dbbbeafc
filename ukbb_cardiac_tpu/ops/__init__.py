"""Pure image/array ops: host (numpy) twins + device (jnp, jit-safe) versions."""

from ukbb_cardiac_tpu.ops.intensity import (
    normalise_intensity,
    normalise_intensity_jax,
    rescale_intensity,
    rescale_intensity_jax,
)
from ukbb_cardiac_tpu.ops.crop import (
    crop_image,
    foreground_bbox,
    pad_image_to_multiple,
    pad_to_multiple,
    pad_to_size,
)
from ukbb_cardiac_tpu.ops.metrics import (
    categorical_accuracy,
    categorical_dice,
    distance_metric,
    np_categorical_dice,
)
from ukbb_cardiac_tpu.ops.cc import (
    get_largest_cc,
    get_trusted_mask,
    remove_small_cc,
)
from ukbb_cardiac_tpu.ops.augment import (
    aortic_batch_augmenter_jax,
    aortic_data_augmenter,
    aortic_data_augmenter_jax,
    data_augmenter,
    data_augmenter_jax,
)
from ukbb_cardiac_tpu.ops.sequence import (
    auto_crop_image,
    image_apply_mask,
    make_sequence,
    padding,
    split_sequence,
    split_volume,
)
from ukbb_cardiac_tpu.ops.resample import affine_transform_2d, sample_2d, warp_image_2d
