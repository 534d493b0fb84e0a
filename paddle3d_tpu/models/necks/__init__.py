from .fpn import CPFPN, FPN
from .second_fpn import SecondFPN
