from .quant import QAT, fake_quant, get_qat_config
