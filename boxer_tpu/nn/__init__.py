from boxer_tpu.nn.attention import BoxAttention, Box3dAttention, InstanceAttention
from boxer_tpu.nn.box_transformer import BoxTransformer
from boxer_tpu.nn.predictor import (
    MLP,
    Detector,
    Detector3d,
    MultiDetector3d,
    SegmentMLP,
)
from boxer_tpu.nn.resnet import BackBone, build_resnet

__all__ = [
    "BoxAttention",
    "Box3dAttention",
    "InstanceAttention",
    "BoxTransformer",
    "MLP",
    "Detector",
    "Detector3d",
    "MultiDetector3d",
    "SegmentMLP",
    "BackBone",
    "build_resnet",
]
