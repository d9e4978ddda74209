from .mlp import (
    MLPConfig,
    init_mlp,
    apply_mlp,
    init_linear,
    apply_linear,
    add_lora,
    lora_mask,
    lora_params,
    merge_lora,
    get_nonlinearity,
)

__all__ = [
    "MLPConfig",
    "init_mlp",
    "apply_mlp",
    "init_linear",
    "apply_linear",
    "add_lora",
    "lora_mask",
    "lora_params",
    "merge_lora",
    "get_nonlinearity",
]
