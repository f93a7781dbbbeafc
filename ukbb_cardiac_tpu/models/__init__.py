"""Model zoo: FCN, ResNet-FCN, U-Net, Temporal U-Net, (Bi)ConvLSTM heads."""

from ukbb_cardiac_tpu.models.fcn import (
    FCNConfig,
    ResNetConfig,
    apply_fcn,
    apply_resnet,
    init_fcn,
    init_resnet,
    prob_and_pred,
)
from ukbb_cardiac_tpu.models.unet import (
    UNetConfig,
    apply_temporal_unet,
    apply_unet,
    init_unet,
)
from ukbb_cardiac_tpu.models.convlstm import (
    apply_biconv_lstm,
    apply_conv_lstm,
    init_biconv_lstm,
    init_conv_lstm,
)
from ukbb_cardiac_tpu.models import losses, wrappers
