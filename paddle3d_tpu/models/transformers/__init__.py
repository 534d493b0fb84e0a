from .transformer_layers import (FFN, BaseTransformerLayer,
                                 MultiHeadAttention,
                                 TransformerLayerSequence)
