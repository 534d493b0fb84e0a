from .squeezesegv3 import SACRangeNet, SqueezeSegV3
