from .custom_resnet import CustomResNet
from .dla import DLA, DLA34
from .hrnet import HRNet, HRNet_W18
from .resnet import ResNet
from .second_backbone import BaseBEVBackbone, SecondBackbone
from .swin import CBSwinTransformer, SwinTransformer
from .vovnet import VoVNet, VoVNetCP
