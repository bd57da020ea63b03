"""Dataclass -> argparse bridge.

Provides the behaviours the reference's vendored HfArgumentParser supplies to
TrainingArgs (/root/reference/gato/utils/typed_argparser.py:113-423):
Literal -> choices, bool -> paired --x/--no_x flags, List -> nargs='+',
Optional unwrapping, metadata help/aliases, parsing into dataclass instances,
and dict/json round-trips — implemented fresh and minimally.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
from enum import Enum
from typing import Any, Dict, List, Literal, Optional, Type, Union, get_args, get_origin


def string_to_bool(v) -> bool:
    if isinstance(v, bool):
        return v
    if v.lower() in ("yes", "true", "t", "y", "1"):
        return True
    if v.lower() in ("no", "false", "f", "n", "0"):
        return False
    raise argparse.ArgumentTypeError(f"truthy value expected, got {v!r}")


class TypedArgumentParser(argparse.ArgumentParser):
    def __init__(self, dataclass_types, **kwargs):
        kwargs.setdefault("formatter_class", argparse.ArgumentDefaultsHelpFormatter)
        super().__init__(**kwargs)
        if dataclasses.is_dataclass(dataclass_types):
            dataclass_types = [dataclass_types]
        self.dataclass_types = list(dataclass_types)
        for dtype in self.dataclass_types:
            self._add_dataclass_arguments(dtype)

    def _add_dataclass_arguments(self, dtype):
        import typing

        # resolve string annotations (PEP 563 / `from __future__ import annotations`)
        hints = typing.get_type_hints(dtype)
        for f in dataclasses.fields(dtype):
            if not f.init:
                continue
            self._add_field(f, hints.get(f.name, f.type))

    def _add_field(self, f: dataclasses.Field, ftype=None):
        name = f"--{f.name}"
        aliases = list(f.metadata.get("aliases", []))
        kwargs: Dict[str, Any] = {}
        if "help" in f.metadata:
            kwargs["help"] = f.metadata["help"]

        if ftype is None:
            ftype = f.type
        origin = get_origin(ftype)

        # Optional[X] -> X (with None default allowed)
        if origin is Union:
            args = [a for a in get_args(ftype) if a is not type(None)]
            assert len(args) == 1, f"unsupported Union field {f.name}: {ftype}"
            ftype = args[0]
            origin = get_origin(ftype)

        default = (
            f.default_factory()
            if f.default_factory is not dataclasses.MISSING
            else f.default
        )
        required = default is dataclasses.MISSING
        if not required:
            kwargs["default"] = default
        else:
            kwargs["required"] = True

        if origin is Literal:
            choices = list(get_args(ftype))
            kwargs["choices"] = choices
            kwargs["type"] = type(choices[0])
            self.add_argument(name, *aliases, **kwargs)
        elif isinstance(ftype, type) and issubclass(ftype, Enum):
            kwargs["choices"] = list(ftype)
            kwargs["type"] = lambda v, e=ftype: e(v)
            self.add_argument(name, *aliases, **kwargs)
        elif ftype is bool:
            # --x [true|false] with a --no_x complement (reference behaviour)
            kwargs["type"] = string_to_bool
            kwargs["nargs"] = "?"
            kwargs["const"] = True
            self.add_argument(name, *aliases, **kwargs)
            self.add_argument(
                f"--no_{f.name}", action="store_false", dest=f.name,
                help=argparse.SUPPRESS,
            )
        elif origin in (list, List):
            (elem,) = get_args(ftype) or (str,)
            kwargs["nargs"] = f.metadata.get("nargs", "+")
            kwargs["type"] = elem
            self.add_argument(name, *aliases, **kwargs)
        else:
            kwargs["type"] = ftype
            self.add_argument(name, *aliases, **kwargs)

    # ------------------------------------------------------------- parsing
    def parse_args_into_dataclasses(
        self, args=None, return_remaining_strings: bool = False
    ):
        args = self._expand_args_files(args)
        namespace, remaining = self.parse_known_args(args)
        outputs = []
        for dtype in self.dataclass_types:
            keys = {f.name for f in dataclasses.fields(dtype) if f.init}
            inputs = {k: v for k, v in vars(namespace).items() if k in keys}
            outputs.append(dtype(**inputs))
        if return_remaining_strings:
            return (*outputs, remaining)
        if remaining:
            raise ValueError(f"Unrecognized arguments: {remaining}")
        return tuple(outputs)

    @staticmethod
    def _expand_args_files(args):
        """Inline the contents of `.args` files given on the command line
        (reference typed_argparser.py:306-334 behaviour: file args come
        first, so explicit CLI flags override them)."""
        import sys

        if args is None:
            args = sys.argv[1:]
        file_args: list = []
        rest: list = []
        for a in args:
            if isinstance(a, str) and a.endswith(".args"):
                with open(a) as fh:
                    file_args += fh.read().split()
            else:
                rest.append(a)
        return file_args + rest

    def parse_dict(self, data: Dict[str, Any], allow_extra_keys: bool = True):
        outputs = []
        for dtype in self.dataclass_types:
            keys = {f.name for f in dataclasses.fields(dtype) if f.init}
            unknown = set(data) - keys
            if unknown and not allow_extra_keys:
                raise ValueError(f"Unknown keys: {sorted(unknown)}")
            outputs.append(dtype(**{k: v for k, v in data.items() if k in keys}))
        return tuple(outputs)

    def parse_json_file(self, path: str, allow_extra_keys: bool = True):
        with open(path) as fh:
            return self.parse_dict(json.load(fh), allow_extra_keys)

    def parse_yaml_file(self, path: str, allow_extra_keys: bool = True):
        """YAML config -> dataclasses (reference typed_argparser.py:407-423)."""
        import yaml

        with open(path) as fh:
            return self.parse_dict(yaml.safe_load(fh), allow_extra_keys)
