"""Model zoo: mHC layers, backbone, ViT, FPN, YOLO head, RAG, top-level systems.

Export surface mirrors the reference's 25-class model package
(reference: src/models/__init__.py:10-103), rebuilt TPU-native.
"""

from .layers import (
    RMSNorm,
    ManifoldHyperConnection,
    SqueezeExcite,
    MultiHeadManifoldAttention,
    DenseAttention,
    MHCTransformerBlock,
)
from .backbone import ConvMHCBlock, HybridVisionBackbone
from .vit import (
    PatchEmbedding,
    interpolate_pos_embed,
    VisionTransformerEncoder,
    VisionTransformerDecoder,
    HybridVisionEncoder,
)
from .fpn import (
    FeaturePyramidNetwork,
    MultiScaleFeatureFusion,
    CrossScaleAttention,
    AdaptiveFeatureFusion,
    upsample2x,
)
from .yolo_head import (
    ANCHOR_REF_GRIDS,
    COCO_ANCHORS_416,
    effective_anchors,
    make_anchor_grid,
    YOLOPredictionHead,
    decode_predictions,
    YOLODetectionHead,
    postprocess_detections,
)
from .rag import (
    build_knowledge_base,
    RAGVisionKnowledge,
    KnowledgeAwareDetection,
    roi_pool_bilinear,
)
from .constraints import compute_constraints
from .quantize import calibrate_quant_scales
from .hybrid import (
    SegmentationHead,
    DepthHead,
    HybridVisionSystem,
    LightweightHybridVision,
    ProductionHybridVision,
    detect,
    collect_stability_metrics,
)

__all__ = [
    "compute_constraints",
    "calibrate_quant_scales",
    "RMSNorm",
    "ManifoldHyperConnection",
    "SqueezeExcite",
    "MultiHeadManifoldAttention",
    "DenseAttention",
    "MHCTransformerBlock",
    "ConvMHCBlock",
    "HybridVisionBackbone",
    "PatchEmbedding",
    "interpolate_pos_embed",
    "VisionTransformerEncoder",
    "VisionTransformerDecoder",
    "HybridVisionEncoder",
    "FeaturePyramidNetwork",
    "MultiScaleFeatureFusion",
    "CrossScaleAttention",
    "AdaptiveFeatureFusion",
    "upsample2x",
    "ANCHOR_REF_GRIDS",
    "COCO_ANCHORS_416",
    "effective_anchors",
    "make_anchor_grid",
    "YOLOPredictionHead",
    "decode_predictions",
    "YOLODetectionHead",
    "postprocess_detections",
    "build_knowledge_base",
    "RAGVisionKnowledge",
    "KnowledgeAwareDetection",
    "roi_pool_bilinear",
    "SegmentationHead",
    "DepthHead",
    "HybridVisionSystem",
    "LightweightHybridVision",
    "ProductionHybridVision",
    "detect",
    "collect_stability_metrics",
]
