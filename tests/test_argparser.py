"""TypedArgumentParser behaviour tests (the reference's only tested module —
tests/utils/test_typed_argparser.py — recreated for our implementation)."""

import dataclasses
from typing import List, Literal, Optional

import pytest

from neko_tpu.training.arguments import TrainingArgs
from neko_tpu.utils.typed_argparser import TypedArgumentParser


@dataclasses.dataclass
class Small:
    x: int = 1
    name: str = "a"
    flag: bool = False
    ratio: float = 0.5
    mode: Literal["fast", "slow"] = "fast"
    items: List[str] = dataclasses.field(default_factory=list, metadata={"nargs": "+"})
    maybe: Optional[int] = None
    k: int = dataclasses.field(default=7, metadata={"aliases": ["-k"]})


def parse(*argv):
    (out,) = TypedArgumentParser(Small).parse_args_into_dataclasses(list(argv))
    return out


def test_basic_types():
    out = parse("--x", "3", "--name", "b", "--ratio", "0.25")
    assert out == Small(x=3, name="b", ratio=0.25)


def test_bool_pair():
    assert parse("--flag").flag is True
    assert parse("--flag", "false").flag is False
    assert parse("--no_flag").flag is False
    assert parse().flag is False


def test_literal_choices():
    assert parse("--mode", "slow").mode == "slow"
    with pytest.raises(SystemExit):
        parse("--mode", "medium")


def test_list_nargs():
    assert parse("--items", "a", "b", "c").items == ["a", "b", "c"]


def test_optional():
    assert parse().maybe is None
    assert parse("--maybe", "5").maybe == 5


def test_alias():
    assert parse("-k", "9").k == 9


def test_unknown_raises():
    with pytest.raises(ValueError, match="Unrecognized"):
        parse("--nope", "1")


def test_args_file(tmp_path):
    f = tmp_path / "run.args"
    f.write_text("--x 5 --items a b\n--mode slow\n")
    out = parse(str(f))
    assert out.x == 5 and out.items == ["a", "b"] and out.mode == "slow"
    # explicit CLI flags override the file
    out = parse(str(f), "--x", "9")
    assert out.x == 9


def test_parse_dict_and_json(tmp_path):
    p = TypedArgumentParser(Small)
    (out,) = p.parse_dict({"x": 4, "extra": 1})
    assert out.x == 4
    import json

    jf = tmp_path / "a.json"
    jf.write_text(json.dumps({"name": "z"}))
    (out,) = p.parse_json_file(str(jf))
    assert out.name == "z"


def test_parse_yaml(tmp_path):
    """parse_yaml_file (reference typed_argparser.py:407-423)."""
    p = TypedArgumentParser(Small)
    yf = tmp_path / "a.yaml"
    yf.write_text("x: 7\nname: why\nextra: true\n")
    (out,) = p.parse_yaml_file(str(yf))
    assert out.x == 7 and out.name == "why"
    import pytest

    with pytest.raises(ValueError, match="Unknown keys"):
        p.parse_yaml_file(str(yf), allow_extra_keys=False)


def test_training_args_round_trip():
    """The full TrainingArgs surface parses (reference
    test_integration_training_args equivalent)."""
    parser = TypedArgumentParser(TrainingArgs)
    (args,) = parser.parse_args_into_dataclasses(
        [
            "--text_prop", "0.5", "-k", "512", "--no_flash",
            "--control_datasets", "a", "b",
            "--eval_mode", "stochastic", "--lora", "--top_k", "3",
        ]
    )
    assert args.sequence_length == 512
    assert args.flash is False
    assert args.control_datasets == ["a", "b"]
    assert args.eval_mode == "stochastic"
    assert args.lora is True and args.top_k == 3
