from .transformer_layers import (FFN, BaseTransformerLayer,
                                 MultiHeadAttention,
                                 TransformerLayerSequence)
from .bevdet_transformer import LSSViewTransformer
from .attentions import (MSDeformableAttention, SpatialCrossAttention,
                         TemporalSelfAttention)
from .positional_encoding import (LearnedPositionalEncoding,
                                  SinePositionalEncoding)
