"""YAML experiment configuration.

Mirrors the reference Config surface (reference: paddle3d/apis/config.py:28):
`_base_` inheritance with `_inherited_: false` opt-out, recursive component
instantiation from dicts carrying a `type:` key, and lazy `model` /
`optimizer` / `lr_scheduler` / `train_dataset` / `val_dataset` properties —
so that reference YAMLs port with type renames only.

TPU-native differences: the optimizer property yields an optax
GradientTransformation factory (built by registered factories in
OPTIMIZERS/LR_SCHEDULERS) rather than a stateful optimizer object.
"""
import codecs
import copy
import os
from typing import Any, Dict, Optional

import yaml

from . import manager


class Config:
    """Parse a YAML training configuration.

    Supported top-level keys (same names as the reference):
      batch_size, iters, epochs, model, optimizer, lr_scheduler,
      train_dataset, val_dataset, amp_cfg, ema_cfg, sync_bn, export.
    """

    def __init__(self,
                 path: str = None,
                 learning_rate: float = None,
                 batch_size: int = None,
                 iters: int = None,
                 epochs: int = None,
                 dic: Dict = None):
        if dic is not None:
            self.dic = copy.deepcopy(dic)
        else:
            if not path:
                raise ValueError("Either path or dic must be given")
            if not os.path.exists(path):
                raise FileNotFoundError("Config file {} not found".format(path))
            if not (path.endswith("yml") or path.endswith("yaml")):
                raise RuntimeError("Config file should be yaml format")
            self.dic = self._parse_from_yaml(path)
        self.update(
            learning_rate=learning_rate,
            batch_size=batch_size,
            iters=iters,
            epochs=epochs)

    # ------------------------------------------------------------------ YAML
    def _update_dic(self, dic: Dict, base_dic: Dict) -> Dict:
        """Merge dic onto base_dic (reference: config.py:90-107)."""
        base_dic = copy.deepcopy(base_dic)
        dic = copy.deepcopy(dic)
        if dic.get("_inherited_", True) is False:
            dic.pop("_inherited_")
            return dic
        for key, val in dic.items():
            if isinstance(val, dict) and key in base_dic and isinstance(
                    base_dic[key], dict):
                base_dic[key] = self._update_dic(val, base_dic[key])
            else:
                base_dic[key] = val
        return base_dic

    def _parse_from_yaml(self, path: str) -> Dict:
        with codecs.open(path, "r", "utf-8") as f:
            dic = yaml.load(f, Loader=yaml.FullLoader) or {}
        if "_base_" in dic:
            cfg_dir = os.path.dirname(path)
            base_path = dic.pop("_base_")
            base_path = os.path.join(cfg_dir, base_path)
            base_dic = self._parse_from_yaml(base_path)
            dic = self._update_dic(dic, base_dic)
        return dic

    def update(self,
               learning_rate: float = None,
               batch_size: int = None,
               iters: int = None,
               epochs: int = None):
        """CLI overrides (reference: config.py:123-141)."""
        if learning_rate is not None:
            self.dic.setdefault("lr_scheduler", {})
            self.dic["lr_scheduler"]["learning_rate"] = learning_rate
        if batch_size is not None:
            self.dic["batch_size"] = batch_size
        if iters is not None:
            self.dic["iters"] = iters
            self.dic.pop("epochs", None)
        if epochs is not None:
            self.dic["epochs"] = epochs
            self.dic.pop("iters", None)

    # ------------------------------------------------------- component build
    def _load_component(self, com_name: str):
        # reference cross-suite escapes ($paddleseg.X / $paddledet.X,
        # config.py:273-323) resolve into the unified registry here — the
        # paddleseg/paddledet components the reference borrows (ResNet,
        # HRNet, DeepLabV3...) are native citizens of this repo
        if com_name.startswith("$paddleseg.") or \
                com_name.startswith("$paddledet."):
            com_name = com_name.split(".", 1)[1]
        for com in manager.ALL_MANAGERS:
            if com_name in com:
                return com[com_name]
        raise RuntimeError(
            "The specified component ({}) was not found".format(com_name))

    def _is_meta_type(self, item: Any) -> bool:
        return isinstance(item, dict) and "type" in item

    def _load_object(self, obj: Dict):
        """Recursively instantiate a dict with a `type:` key
        (reference: config.py:325-346)."""
        dic = copy.deepcopy(obj)
        component = self._load_component(dic.pop("type"))
        params = {}
        for key, val in dic.items():
            if self._is_meta_type(val):
                params[key] = self._load_object(val)
            elif isinstance(val, list):
                params[key] = [
                    self._load_object(item) if self._is_meta_type(item) else
                    item for item in val
                ]
            else:
                params[key] = val
        try:
            return component(**params)
        except TypeError:
            # Reference configs carry framework-specific knobs with no
            # equivalent here (lr_mult_list, to_static, with_cp, ...).
            # Retry with signature-filtered kwargs and WARN about every
            # dropped key so silent semantic drift is visible.
            import inspect
            target = component.__init__ if inspect.isclass(component) \
                else component
            sig = inspect.signature(target)
            if any(p.kind == inspect.Parameter.VAR_KEYWORD
                   for p in sig.parameters.values()):
                raise
            keep = {k: v for k, v in params.items() if k in sig.parameters}
            dropped = sorted(set(params) - set(keep))
            if not dropped:
                raise
            from ..utils.logger import logger
            logger.warning(
                "{}: dropping config keys with no equivalent here: {}".format(
                    getattr(component, "__name__", component), dropped))
            return component(**keep)

    # ------------------------------------------------------------ properties
    @property
    def batch_size(self) -> int:
        return self.dic.get("batch_size", 1)

    @property
    def iters(self) -> Optional[int]:
        return self.dic.get("iters")

    @property
    def epochs(self) -> Optional[int]:
        return self.dic.get("epochs")

    @property
    def train_by_epoch(self) -> bool:
        return "epochs" in self.dic

    @property
    def model(self):
        if not hasattr(self, "_model"):
            model_cfg = self.dic.get("model")
            if model_cfg is None:
                raise RuntimeError("No model specified in the configuration")
            self._model = self._load_object(model_cfg)
        return self._model

    @property
    def train_dataset_config(self) -> Dict:
        return copy.deepcopy(self.dic.get("train_dataset", {}))

    @property
    def val_dataset_config(self) -> Dict:
        return copy.deepcopy(self.dic.get("val_dataset", {}))

    @property
    def train_dataset(self):
        cfg = self.train_dataset_config
        if not cfg:
            return None
        return self._load_object(cfg)

    @property
    def val_dataset(self):
        cfg = self.val_dataset_config
        if not cfg:
            return None
        return self._load_object(cfg)

    @property
    def lr_scheduler(self):
        """Returns an optax schedule (callable step -> lr)."""
        if "lr_scheduler" not in self.dic:
            raise RuntimeError("No lr_scheduler specified in the configuration")
        cfg = copy.deepcopy(self.dic["lr_scheduler"])
        return self._load_object(cfg)

    @property
    def optimizer(self):
        """Returns an optax GradientTransformation."""
        if "optimizer" not in self.dic:
            raise RuntimeError("No optimizer specified in the configuration")
        cfg = copy.deepcopy(self.dic["optimizer"])
        if "lr_scheduler" in self.dic and "learning_rate" not in cfg:
            cfg["learning_rate"] = self.lr_scheduler
        return self._load_object(cfg)

    @property
    def amp_cfg(self) -> Dict:
        return copy.deepcopy(self.dic.get("amp_cfg", {}))

    @property
    def ema_cfg(self) -> Dict:
        return copy.deepcopy(self.dic.get("ema_cfg", {}))

    @property
    def export_cfg(self) -> Dict:
        return copy.deepcopy(self.dic.get("export", {}))

    @property
    def sync_bn(self) -> bool:
        return self.dic.get("sync_bn", False)

    def to_dict(self) -> Dict:
        dic = copy.deepcopy(self.dic)
        dic.update({
            "batch_size": self.batch_size,
            "model": self.model,
        })
        if "train_dataset" in dic:
            dic["train_dataset"] = self.train_dataset
        if "val_dataset" in dic:
            dic["val_dataset"] = self.val_dataset
        if "optimizer" in dic:
            dic["optimizer"] = self.optimizer
        dic.pop("lr_scheduler", None)
        if self.iters is not None:
            dic["iters"] = self.iters
        if self.epochs is not None:
            dic["epochs"] = self.epochs
        return dic

    def __str__(self):
        return yaml.dump(self.dic)
