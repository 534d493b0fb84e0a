from .fpn import CPFPN, FPN, FPNC
from .lss_fpn import FPN_LSS
from .second_fpn import SecondFPN
