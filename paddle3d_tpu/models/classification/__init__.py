from .paconv import PAConv
