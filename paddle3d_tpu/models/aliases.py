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
manager.NECKS.add_alias("LSSViewTransformerBEVDepth",
                        transformers.LSSViewTransformer)

# --- heads ----------------------------------------------------------------
manager.HEADS.add_alias("AnchorHeadSingle", heads.Anchor3DHead)
manager.HEADS.add_alias("CenterHeadMatch", detection.CenterHead)
manager.HEADS.add_alias("PETRHeadseg", heads.PETRSegHead)
manager.HEADS.add_alias("CAPETemporalDNHead", heads.CAPEHead)
manager.HEADS.add_alias("PVRCNNHead", heads.RoIGridHead)
manager.HEADS.add_alias("VoxelRCNNHead", heads.RoIGridHead)
manager.HEADS.add_alias("OCRHead", heads.OCRNetHead)

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
