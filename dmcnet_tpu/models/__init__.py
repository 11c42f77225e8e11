"""Model zoo: DMC generators, discriminators, ResNet-18 TSN, I3D.

All models are flax.linen modules in NHWC (TPU-native) layout with channel
plans matching the reference architectures (code/dmcnet{,_GAN}/model.py,
code/dmcnet_I3D/network/i3d.py).
"""

from dmcnet_tpu.models.generators import (
    ContextNetwork,
    ContextNetworkAtt,
    EstimatorDenseNet,
    EstimatorDenseNetSmall,
    EstimatorDenseNetTiny,
    EstimatorDenseNetTinyEarlyFusionSum,
    EstimatorDenseNetTinyEarlyFusionStack,
    make_estimator,
)
from dmcnet_tpu.models.discriminators import (
    Discriminator,
    Discriminator2,
    Discriminator3,
    Discriminator4,
    Discriminator5,
    make_discriminator,
)
from dmcnet_tpu.models.resnet import ResNet, resnet18
from dmcnet_tpu.models.tsn import DMCNet, PlainTSN, segment_consensus
