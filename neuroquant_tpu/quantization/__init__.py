from neuroquant_tpu.quantization.spec import QuantSpec, make_spec  # noqa: F401
from neuroquant_tpu.quantization.qmodel import (  # noqa: F401
    QuantModel, init_quant_state, quantize_params, adaround_upgrade,
    get_perturbation, average_bits, collect_int_codes, round_loss,
)
from neuroquant_tpu.quantization.calibrate import (  # noqa: F401
    model_reconstruction, LinearTempDecay,
)
from neuroquant_tpu.quantization.sensitivity import (  # noqa: F401
    sensitivity_criterion,
)
from neuroquant_tpu.quantization.calib_unit import (  # noqa: F401
    block_reconstruction, layer_reconstruction,
)
