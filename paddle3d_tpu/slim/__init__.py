from .quant import (QAT, fake_quant, get_qat_config, normalize_quant_config,
                    update_dic)
