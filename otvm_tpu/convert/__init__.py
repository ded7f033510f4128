from .torch_import import (  # noqa: F401
    convert_fba,
    convert_stm,
    convert_joint,
    load_torch_state_dict,
)
