"""Model zoo registry.

The reference loads models by ``exec()``-ing a config-referenced .py file and
instantiating its ``Model`` class (/root/reference/utils/train_util.py:23-34).
Here models are registered by name; for config compatibility, the reference's
``generator:`` paths map onto registry names too.
"""

from typing import Any, Dict

_REGISTRY: Dict[str, Any] = {}

# reference generator path -> registry name (utils/train_util.py:23-34 usage)
_GENERATOR_ALIASES = {
    "./model_zoo/scanobject/classifier.py": "scanobject_classifier",
    "./model_zoo/scanobject/classifier_scales.py": "scanobject_classifier_scales",
    "./model_zoo/s3dis/segmenter.py": "s3dis_segmenter",
    "./model_zoo/s3dis/segmenter_pad.py": "s3dis_segmenter_pad",
    "./model_zoo/completion/inpainter.py": "completion_inpainter",
    "./model_zoo/image_reconstruction/reconstructor.py": "image_reconstructor",
}


def register(name):
    def deco(cls):
        _REGISTRY[name] = cls
        return cls
    return deco


def get_model(name, **kwargs):
    """Instantiate a registered model (accepts registry names or the
    reference's ``generator`` paths)."""
    key = _GENERATOR_ALIASES.get(name, name)
    key = _GENERATOR_ALIASES.get(key.replace("model_zoo_tpu", "model_zoo"), key)
    if key not in _REGISTRY:
        raise KeyError(
            f"unknown model {name!r}; available: {sorted(_REGISTRY)}")
    return _REGISTRY[key](**kwargs)


def available_models():
    return sorted(_REGISTRY)


# import for side-effect registration
from cloud_transformers_tpu.models import classifier  # noqa: E402,F401
from cloud_transformers_tpu.models import segmenter  # noqa: E402,F401
from cloud_transformers_tpu.models import inpainter  # noqa: E402,F401
from cloud_transformers_tpu.models import reconstructor  # noqa: E402,F401
