"""Reference type-name aliases.

The reference's YAML configs address components by class name; where this
repo's equivalent class is named differently, register the reference name
as an alias so reference configs resolve with fewer (ideally zero) type
renames (SURVEY.md §5: "reproduce this exact YAML surface").

Only genuine semantic equivalents are aliased — components whose behavior
is folded into a different architecture here are NOT aliased.
"""
from ..apis import manager
from . import (backbones, detection, heads, losses, middle_encoders, necks,
               segmentation, transformers)

# --- models (reference entry-class names) ---------------------------------
manager.MODELS.add_alias("Petr3D", detection.PETR)
manager.MODELS.add_alias("Petr3D_seg", detection.PETR)
manager.MODELS.add_alias("CAPE", detection.PETR)
manager.MODELS.add_alias("BEVDet4D", detection.BEVDet)
manager.MODELS.add_alias("BEVDetFormer", detection.RTEBev)
manager.MODELS.add_alias("BEVFFasterRCNN", detection.BEVFusion)
manager.MODELS.add_alias("MVXFasterRCNN", detection.BEVFusion)

# --- backbones ------------------------------------------------------------
manager.BACKBONES.add_alias("MMResNet", backbones.ResNet)
manager.BACKBONES.add_alias("SACRangeNet21", segmentation.SACRangeNet)
manager.BACKBONES.add_alias("SACRangeNet53", segmentation.SACRangeNet)
manager.BACKBONES.add_alias("VoVNet99_eSE", backbones.VoVNet)

# --- necks ----------------------------------------------------------------
manager.NECKS.add_alias("CustomFPN", necks.FPN)

# --- heads ----------------------------------------------------------------


@manager.HEADS.add_component
def AnchorHeadSingle(model_cfg=None, input_channels=None,
                     point_cloud_range=None, class_names=None,
                     voxel_size=None, anchor_generator_cfg=(),
                     predict_boxes_when_training=True, **kwargs):
    """OpenPCDet-style anchor-head spec -> Anchor3DHead (reference:
    paddle3d/models/heads/dense_heads/anchor_head_single.py — per-class
    anchor_sizes [l, w, h] + anchor_bottom_heights + feature_map_stride).
    Translates to this repo's per-class lattice configs (sizes [w, l, h],
    explicit strides/offsets with centers at half-stride)."""
    strides = {c["feature_map_stride"] for c in anchor_generator_cfg}
    assert len(strides) == 1, "per-class feature_map_stride must agree"
    stride = strides.pop()
    sx = float(voxel_size[0]) * stride
    sy = float(voxel_size[1]) * stride
    anchor_configs = []
    for cfg in anchor_generator_cfg:
        for size in cfg["anchor_sizes"]:
            anchor_configs.append(dict(
                sizes=[size[1], size[0], size[2]],
                anchor_strides=[sx, sy, 0.0],
                anchor_offsets=[float(point_cloud_range[0]) + sx / 2,
                                float(point_cloud_range[1]) + sy / 2,
                                float(cfg["anchor_bottom_heights"][0])],
                rotations=list(cfg.get("anchor_rotations", (0., 1.57))),
                matched_threshold=cfg.get("matched_threshold", 0.6),
                unmatched_threshold=cfg.get("unmatched_threshold", 0.45)))
    return heads.Anchor3DHead(
        num_classes=len(class_names),
        feature_channels=input_channels,
        anchor_configs=anchor_configs,
        point_cloud_range=list(point_cloud_range),
        voxel_size=list(voxel_size),
        output_stride_factor=stride)
manager.HEADS.add_alias("CenterHeadMatch", detection.CenterHead)
manager.HEADS.add_alias("CAPETemporalDNHead", heads.CAPEHead)


@manager.HEADS.add_component
def PETRHeadseg(**kwargs):
    """Reference PETRv2-BEVseg head spec (det queries + num_lane seg
    queries in ONE head) — carried as a dict; the Petr3D_seg model
    translates it into this repo's det PETRHead + PETRSegHead pair."""
    kwargs["type"] = "PETRHeadseg"
    return kwargs
@manager.HEADS.add_component
def PVRCNNHead(input_channels=128, num_class=1, model_cfg=None, **kwargs):
    """OpenPCDet-style PV-RCNN RoI head spec -> RoIGridHead (reference:
    configs/pv_rcnn/pv_rcnn_005voxel_kitti.yml:134 — keypoint support set
    pooled at roi_grid_pool radii)."""
    m = dict(model_cfg or {})
    pool = m.get("roi_grid_pool", {}) or {}
    mlps = pool.get("mlps", [[64, 64]])
    return heads.RoIGridHead(
        in_channels=input_channels,
        grid_size=int(pool.get("grid_size", 6)),
        mlps=list(mlps[0]),
        radii=list(pool.get("pool_radius", (0.8, 1.6))),
        nsamples=list(pool.get("nsample", (16, 16))),
        head_fc=list(m.get("shared_fc", (256, 256))))


@manager.HEADS.add_component
def VoxelRCNNHead(input_channels=None, num_class=1, model_cfg=None,
                  **kwargs):
    """OpenPCDet-style Voxel-RCNN RoI head spec -> RoIGridHead (reference:
    configs/voxel_rcnn/voxel_rcnn_005voxel_kitti_car.yml:114 — per-level
    voxel-query pooling over the named sparse stages)."""
    m = dict(model_cfg or {})
    pool = m.get("roi_grid_pool", {}) or {}
    layers = pool.get("pool_layers", {}) or {}
    sources = pool.get("features_source",
                       sorted(k for k in layers)) or []
    ins, radii, nsamples, mlps = [], [], [], [[32, 32]]
    for src in sources:
        spec = layers.get(src, {})
        if isinstance(input_channels, dict):
            ins.append(int(input_channels[src]))
        radii.append(float(spec.get("pool_radius", [0.8])[-1]))
        nsamples.append(int(spec.get("nsample", [16])[-1]))
        mlps = spec.get("mlps", mlps)
    if not isinstance(input_channels, dict):
        ins = input_channels
    return heads.RoIGridHead(
        in_channels=ins,
        grid_size=int(pool.get("grid_size", 6)),
        mlps=list(mlps[0]),
        radii=radii or [0.8, 1.6],
        nsamples=nsamples or [16, 16],
        head_fc=list(m.get("shared_fc", (256, 256))))
manager.HEADS.add_alias("OCRHead", heads.OCRNetHead)

# --- architecture-internal spec carriers -----------------------------------
# Reference configs compose transformer stacks / sub-heads from named
# internal components (PETRTransformer, PerceptionTransformer, ...). Those
# stacks are folded into whole-model designs here; the names below resolve
# to plain-dict SPEC CARRIERS whose fields the owning head translates
# (e.g. PETRHead reads decoder.num_layers / embed_dims out of its
# `transformer:` spec). Registering them keeps the reference YAMLs building
# VERBATIM without pretending the internal classes exist as modules.


def _register_spec(name, registry=manager.TRANSFORMERS):
    def make(**kwargs):
        spec = dict(kwargs)
        spec["type"] = name
        return spec
    make.__name__ = name
    registry.add_component(make)


for _n in ("PETRTransformer", "PETRDNTransformer", "PETRTransformerDecoder",
           "PETRTransformerDecoderLayer", "PerceptionTransformer",
           "BEVFormerEncoder", "BEVFormerLayer", "DetrTransformerDecoderLayer",
           "DetectionTransformerDecoder", "RTEBevTransformer",
           "CAPETransformer", "CPTR", "CrossViewAttention", "CrossAttention"):
    _register_spec(_n)
_register_spec("IASSD_Backbone", manager.BACKBONES)
_register_spec("IASSD_Head", manager.HEADS)
for _n in ("FCOS2DHead", "FCOS3DHead", "FCOS2DLoss", "FCOS3DLoss",
           "FCOS2DInference", "FCOS3DInference", "DD3DTargetPreparer"):
    _register_spec(_n, manager.HEADS)
_register_spec("BEVFormerEncoderLayer", manager.TRANSFORMER_ENCODER_LAYERS)
_register_spec("AlignedAnchor3DRangeGenerator", manager.BBOX_CODERS)

# --- attentions -----------------------------------------------------------
manager.ATTENTIONS.add_alias("MultiheadAttention",
                             transformers.MultiHeadAttention)
manager.ATTENTIONS.add_alias("PETRMultiheadAttention",
                             transformers.MultiHeadAttention)
manager.ATTENTIONS.add_alias("MSDeformableAttention3D",
                             transformers.SpatialCrossAttention)
manager.ATTENTIONS.add_alias("CustomMSDeformableAttention",
                             transformers.MSDeformableAttention)

# --- datasets -------------------------------------------------------------
from .. import datasets as _ds  # noqa: E402

manager.DATASETS.add_alias("ApolloOffsetDataset", _ds.ApolloLaneDataset)
manager.DATASETS.add_alias("ApolloOffsetValDataset", _ds.ApolloLaneDataset)
manager.DATASETS.add_alias("SemanticKITTISegDataset",
                           _ds.SemanticKITTIDataset)
manager.DATASETS.add_alias("BEVDetNuScenesDataset", _ds.NuscenesMVDataset)
manager.DATASETS.add_alias("Custom3DDataset", _ds.NuscenesMVDataset)

# --- transforms (identical semantics, different reference names) ----------
from ..transforms import aliases as _transform_aliases  # noqa: E402,F401
