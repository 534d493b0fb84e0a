"""Component registry.

TPU-native re-design of the reference's ComponentManager
(reference: paddle3d/apis/manager.py:31,125,146-169). The registry is pure
Python with no framework dependency so that reference YAML configs port with
type-name changes only.
"""
import inspect
from collections.abc import Sequence


class ComponentManager:
    """A name -> component registry with decorator-based registration.

    Example:
        MODELS = ComponentManager("models")

        @MODELS.add_component
        class PointPillars: ...

        model_cls = MODELS["PointPillars"]
    """

    def __init__(self, name: str):
        self._components_dict = {}
        self._name = name

    def __len__(self):
        return len(self._components_dict)

    def __repr__(self):
        return "{}:{}".format(self.__class__.__name__, self._name)

    def __getitem__(self, item: str):
        if item not in self._components_dict:
            raise KeyError(
                "{} does not exist in registry {}. Available: {}".format(
                    item, self._name, sorted(self._components_dict)))
        return self._components_dict[item]

    def __contains__(self, item: str):
        return item in self._components_dict

    @property
    def components_dict(self) -> dict:
        return self._components_dict

    @property
    def name(self) -> str:
        return self._name

    def _add_single_component(self, component):
        if not (inspect.isclass(component) or inspect.isfunction(component)):
            raise TypeError(
                "Expect class/function type, but received {}".format(
                    type(component)))
        component_name = component.__name__
        if component_name in self._components_dict:
            raise KeyError("{} already exists in registry {}".format(
                component_name, self._name))
        self._components_dict[component_name] = component

    def add_component(self, components):
        """Register a component (usable as a decorator) or a sequence of them."""
        if isinstance(components, Sequence):
            for component in components:
                self._add_single_component(component)
        else:
            self._add_single_component(components)
        return components

    def add_alias(self, name: str, component):
        """Register an existing component under an additional type name —
        used to accept the reference's type names verbatim in YAML configs
        where this repo's class is named differently (models/aliases.py)."""
        if name in self._components_dict:
            raise KeyError("{} already exists in registry {}".format(
                name, self._name))
        self._components_dict[name] = component
        return component


# The global registries, mirroring the reference's 24 registries
# (reference: paddle3d/apis/manager.py:146-169).
BACKBONES = ComponentManager("backbones")
MIDDLE_ENCODERS = ComponentManager("middle_encoders")
MODELS = ComponentManager("models")
NECKS = ComponentManager("necks")
VOXEL_ENCODERS = ComponentManager("voxel_encoders")
LOSSES = ComponentManager("losses")
DATASETS = ComponentManager("datasets")
TRANSFORMS = ComponentManager("transforms")
LR_SCHEDULERS = ComponentManager("lr_schedulers")
OPTIMIZERS = ComponentManager("optimizers")
VOXELIZERS = ComponentManager("voxelizers")
HEADS = ComponentManager("heads")
POINT_ENCODERS = ComponentManager("point_encoders")
POSITIONAL_ENCODING = ComponentManager("positional_encoding")
TRANSFORMERS = ComponentManager("transformers")
TRANSFORMER_ENCODERS = ComponentManager("transformer_encoders")
TRANSFORMER_ENCODER_LAYERS = ComponentManager("transformer_encoder_layers")
ATTENTIONS = ComponentManager("attentions")
BBOX_CODERS = ComponentManager("bbox_coders")
BBOX_ASSIGNERS = ComponentManager("bbox_assigners")
MATCH_COSTS = ComponentManager("match_costs")
BBOX_SAMPLERS = ComponentManager("bbox_samplers")
TRANSFORMER_DECODER_LAYERS = ComponentManager("transformer_decoder_layers")
TRANSFORMER_DECODERS = ComponentManager("transformer_decoders")

ALL_MANAGERS = [
    BACKBONES, MIDDLE_ENCODERS, MODELS, NECKS, VOXEL_ENCODERS, LOSSES,
    DATASETS, TRANSFORMS, LR_SCHEDULERS, OPTIMIZERS, VOXELIZERS, HEADS,
    POINT_ENCODERS, POSITIONAL_ENCODING, TRANSFORMERS, TRANSFORMER_ENCODERS,
    TRANSFORMER_ENCODER_LAYERS, ATTENTIONS, BBOX_CODERS, BBOX_ASSIGNERS,
    MATCH_COSTS, BBOX_SAMPLERS, TRANSFORMER_DECODER_LAYERS,
    TRANSFORMER_DECODERS
]
