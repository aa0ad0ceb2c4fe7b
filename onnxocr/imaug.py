"""Reference surface: onnxocr/imaug.py — op chaining. The reference
instantiates ops via eval() on class names (imaug.py:30, parity trap #12);
this build uses an explicit registry with the same op names."""
from . import operators

__all__ = ["transform", "create_operators"]

_REGISTRY = {
    "NormalizeImage": operators.NormalizeImage,
    "DetResizeForTest": operators.DetResizeForTest,
    "ToCHWImage": operators.ToCHWImage,
    "KeepKeys": operators.KeepKeys,
}


def transform(data, ops=None):
    if ops is None:
        ops = []
    for op in ops:
        data = op(data)
        if data is None:
            return None
    return data


def create_operators(op_param_list, global_config=None):
    assert isinstance(op_param_list, list), "operator config should be a list"
    ops = []
    for operator in op_param_list:
        assert isinstance(operator, dict) and len(operator) == 1, \
            "yaml format error"
        op_name = list(operator)[0]
        param = {} if operator[op_name] is None else dict(operator[op_name])
        if global_config is not None:
            param.update(global_config)
        if op_name not in _REGISTRY:
            raise KeyError(f"unknown preprocessing op {op_name!r}")
        ops.append(_REGISTRY[op_name](**param))
    return ops
