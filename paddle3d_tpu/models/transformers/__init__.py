from .transformer_layers import (FFN, BaseTransformerLayer,
                                 MultiHeadAttention,
                                 TransformerLayerSequence)
from .bevdet_transformer import LSSViewTransformer
