from .custom_resnet import CustomResNet
from .dla import DLA, DLA34
from .resnet import ResNet
from .second_backbone import SecondBackbone
