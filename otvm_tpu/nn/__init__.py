from . import ops, layers, resnet, resnet_gn_ws, edt  # noqa: F401
