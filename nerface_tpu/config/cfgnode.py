"""YACS-style config tree.

Drop-in behavioral equivalent of the reference's config layer
(`nerface_code/nerf-pytorch/nerf/cfgnode.py:36-419`): a nested dict with
attribute access, immutability toggles, YAML round-tripping, file/list
merging, and value coercion.  Accepts the reference's experiment YAML files
unchanged (e.g. `config/dave/dave_dvp_lcode_fixed_bg_512_paper_model.yml`).

This is a fresh implementation, not a port — the reference's
deprecated/renamed-key registry is kept as a minimal hook since no shipped
config uses it.
"""

from __future__ import annotations

import copy
import io
from typing import Any, Dict, List, Optional

import yaml

_VALID_TYPES = (tuple, list, str, int, float, bool, type(None))

_IMMUTABLE = "__immutable__"
_DEPRECATED = "__deprecated_keys__"
_RENAMED = "__renamed_keys__"


class CfgNode(dict):
    """A nested configuration node with attribute access and freezing."""

    def __init__(self, init_dict: Optional[Dict] = None, key_list: Optional[List[str]] = None):
        init_dict = {} if init_dict is None else init_dict
        key_list = [] if key_list is None else key_list
        init_dict = self._create_config_tree_from_dict(init_dict, key_list)
        super().__init__(init_dict)
        self.__dict__[_IMMUTABLE] = False
        self.__dict__[_DEPRECATED] = set()
        self.__dict__[_RENAMED] = {}

    @classmethod
    def _create_config_tree_from_dict(cls, dic: Dict, key_list: List[str]) -> Dict:
        dic = copy.deepcopy(dic)
        for k, v in dic.items():
            if isinstance(v, dict):
                dic[k] = cls(v, key_list=key_list + [str(k)])
            else:
                if not _valid_type(v, allow_cfg_node=False):
                    raise AttributeError(
                        "key {} with value {} is not a valid type; valid types: {}".format(
                            ".".join(key_list + [str(k)]), type(v), _VALID_TYPES
                        )
                    )
        return dic

    # -- attribute access ---------------------------------------------------

    def __getattr__(self, name: str) -> Any:
        if name in self:
            return self[name]
        raise AttributeError(name)

    def __setattr__(self, name: str, value: Any) -> None:
        if self.is_frozen():
            raise AttributeError(
                "attempted to set {} to {}, but CfgNode is immutable".format(name, value)
            )
        if name in self.__dict__:
            raise AttributeError("invalid attempt to modify internal state: {}".format(name))
        if not _valid_type(value, allow_cfg_node=True):
            raise AttributeError(
                "invalid type {} for key {}; valid types = {}".format(type(value), name, _VALID_TYPES)
            )
        self[name] = value

    # -- printing -----------------------------------------------------------

    def __str__(self) -> str:
        def _indent(s, num_spaces):
            lines = s.split("\n")
            if len(lines) == 1:
                return s
            first = lines.pop(0)
            lines = [(num_spaces * " ") + line for line in lines]
            return first + "\n" + "\n".join(lines)

        r = ""
        s = []
        for k, v in sorted(self.items()):
            sep = "\n" if isinstance(v, CfgNode) else " "
            attr_str = "{}:{}{}".format(str(k), sep, str(v))
            attr_str = _indent(attr_str, 2)
            s.append(attr_str)
        r += "\n".join(s)
        return r

    def __repr__(self) -> str:
        return "{}({})".format(self.__class__.__name__, super().__repr__())

    # -- freezing -----------------------------------------------------------

    def freeze(self) -> None:
        self._set_immutable(True)

    def defrost(self) -> None:
        self._set_immutable(False)

    def is_frozen(self) -> bool:
        return self.__dict__[_IMMUTABLE]

    def _set_immutable(self, is_immutable: bool) -> None:
        self.__dict__[_IMMUTABLE] = is_immutable
        for v in self.__dict__.values():
            if isinstance(v, CfgNode):
                v._set_immutable(is_immutable)
        for v in self.values():
            if isinstance(v, CfgNode):
                v._set_immutable(is_immutable)

    # -- cloning / merging --------------------------------------------------

    def clone(self) -> "CfgNode":
        return copy.deepcopy(self)

    def dump(self, **kwargs) -> str:
        def convert_to_dict(node, key_list):
            if not isinstance(node, CfgNode):
                _valid_type(node, allow_cfg_node=False)
                return node
            return {k: convert_to_dict(v, key_list + [str(k)]) for k, v in node.items()}

        return yaml.safe_dump(convert_to_dict(self, []), **kwargs)

    def merge_from_file(self, cfg_filename: str) -> None:
        with open(cfg_filename, "r") as f:
            cfg = self.load_cfg(f)
        self.merge_from_other_cfg(cfg)

    def merge_from_other_cfg(self, cfg_other: "CfgNode") -> None:
        _merge_a_into_b(cfg_other, self, self, [])

    def merge_from_list(self, cfg_list: List) -> None:
        assert len(cfg_list) % 2 == 0, "override list has odd length: {}".format(cfg_list)
        root = self
        for full_key, v in zip(cfg_list[0::2], cfg_list[1::2]):
            if root.key_is_deprecated(full_key):
                continue
            if root.key_is_renamed(full_key):
                root.raise_key_rename_error(full_key)
            key_list = full_key.split(".")
            d = self
            for subkey in key_list[:-1]:
                assert subkey in d, "non-existent key: {}".format(full_key)
                d = d[subkey]
            subkey = key_list[-1]
            assert subkey in d, "non-existent key: {}".format(full_key)
            value = self._decode_cfg_value(v)
            value = _check_and_coerce_cfg_value_type(value, d[subkey], subkey, full_key)
            d[subkey] = value

    # -- deprecation hooks (API parity; no shipped config uses them) --------

    def register_deprecated_key(self, key: str) -> None:
        self.__dict__[_DEPRECATED].add(key)

    def register_renamed_key(self, old_name: str, new_name: str, message: Optional[str] = None) -> None:
        self.__dict__[_RENAMED][old_name] = (new_name, message) if message else (new_name,)

    def key_is_deprecated(self, full_key: str) -> bool:
        return full_key in self.__dict__[_DEPRECATED]

    def key_is_renamed(self, full_key: str) -> bool:
        return full_key in self.__dict__[_RENAMED]

    def raise_key_rename_error(self, full_key: str) -> None:
        new_key = self.__dict__[_RENAMED][full_key]
        msg = " Note: " + new_key[1] if len(new_key) > 1 else ""
        raise KeyError(
            "key {} was renamed to {};{}".format(full_key, new_key[0], msg)
        )

    # -- loading ------------------------------------------------------------

    @classmethod
    def load_cfg(cls, cfg_file_obj_or_str) -> "CfgNode":
        if isinstance(cfg_file_obj_or_str, str):
            cfg_as_dict = yaml.safe_load(cfg_file_obj_or_str)
        elif isinstance(cfg_file_obj_or_str, io.IOBase) or hasattr(cfg_file_obj_or_str, "read"):
            cfg_as_dict = yaml.safe_load(cfg_file_obj_or_str.read())
        else:
            raise NotImplementedError(
                "cannot load config from {}".format(type(cfg_file_obj_or_str))
            )
        if cfg_as_dict is None:
            cfg_as_dict = {}
        return cls(cfg_as_dict)

    @classmethod
    def _decode_cfg_value(cls, value):
        if isinstance(value, dict):
            return cls(value)
        if not isinstance(value, str):
            return value
        try:
            import ast

            value = ast.literal_eval(value)
        except (ValueError, SyntaxError):
            pass
        return value


def _valid_type(value, allow_cfg_node: bool = False) -> bool:
    return (type(value) in _VALID_TYPES) or (allow_cfg_node and isinstance(value, CfgNode))


def _merge_a_into_b(a: CfgNode, b: CfgNode, root: CfgNode, key_list: List[str]) -> None:
    assert isinstance(a, CfgNode), "`a` (cur type {}) must be a CfgNode".format(type(a))
    assert isinstance(b, CfgNode), "`b` (cur type {}) must be a CfgNode".format(type(b))
    for k, v_ in a.items():
        full_key = ".".join(key_list + [str(k)])
        v = copy.deepcopy(v_)
        v = b._decode_cfg_value(v)
        if k in b:
            v = _check_and_coerce_cfg_value_type(v, b[k], k, full_key)
            if isinstance(v, CfgNode):
                try:
                    _merge_a_into_b(v, b[k], root, key_list + [str(k)])
                except BaseException:
                    raise
            else:
                b[k] = v
        elif root.key_is_deprecated(full_key):
            continue
        elif root.key_is_renamed(full_key):
            root.raise_key_rename_error(full_key)
        else:
            b[k] = v


def _check_and_coerce_cfg_value_type(replacement, original, key, full_key):
    original_type = type(original)
    replacement_type = type(replacement)
    if replacement_type == original_type or original is None:
        return replacement

    def conditional_cast(from_type, to_type):
        if replacement_type == from_type and original_type == to_type:
            return True, to_type(replacement)
        return False, None

    casts = [(tuple, list), (list, tuple), (int, float)]
    for from_type, to_type in casts:
        converted, converted_value = conditional_cast(from_type, to_type)
        if converted:
            return converted_value

    raise ValueError(
        "type mismatch ({} vs. {}) with values ({} vs. {}) for config key: {}".format(
            original_type, replacement_type, original, replacement, full_key
        )
    )


def load_config(path: str) -> CfgNode:
    """Load a reference-format experiment YAML into a CfgNode.

    Equivalent of the reference's inline config load
    (`train_transformed_rays.py:39-42`).
    """
    with open(path, "r") as f:
        cfg_dict = yaml.safe_load(f)
    return CfgNode(cfg_dict)
