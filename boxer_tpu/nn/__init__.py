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
from boxer_tpu.nn.box3d_transformer import Box3dTransformer
from boxer_tpu.nn.transformer import Transformer
from boxer_tpu.nn.dense_attention import PallasMultiHeadAttention
from boxer_tpu.nn.matcher import (
    HungarianMatcher,
    HungarianMatcher3d,
    build_matcher,
    hungarian,
)
from boxer_tpu.nn.backbone3d import Backbone3d, build_backbone3d
from boxer_tpu.nn.point_pillar import PillarFeatureNet, PointPillarsScatter

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
    "Box3dTransformer",
    "Transformer",
    "PallasMultiHeadAttention",
    "HungarianMatcher",
    "HungarianMatcher3d",
    "build_matcher",
    "hungarian",
    "Backbone3d",
    "build_backbone3d",
    "PillarFeatureNet",
    "PointPillarsScatter",
]
