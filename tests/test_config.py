"""sacred-compatible config emulation tests."""

from reconvat_tpu.config import Experiment, parse_cli, resolve_config


def test_parse_cli():
    cmds, ov = parse_cli(["print_config", "with", "a=1", "b=True",
                          "c=text", "d=1e-6", "e=[1,2]"])
    assert cmds == ["print_config"]
    assert ov == {"a": 1, "b": True, "c": "text", "d": 1e-6, "e": [1, 2]}


def test_derived_values_see_overrides():
    def config():
        lr = 1e-3
        small = False
        name = f"run-lr={lr}-small={small}"

    cfg = resolve_config(config, {"lr": 5e-4})
    assert cfg["lr"] == 5e-4
    assert cfg["name"] == "run-lr=0.0005-small=False"

    cfg = resolve_config(config, {"small": True})
    assert cfg["name"] == "run-lr=0.001-small=True"


def test_augassign_pinned_by_override():
    def config():
        batch = 8
        batch //= 2  # conditional shrink in the reference configs

    cfg = resolve_config(config, {"batch": 16})
    assert cfg["batch"] == 16          # override wins over the //= 2
    cfg = resolve_config(config, {})
    assert cfg["batch"] == 4


def test_experiment_run_and_unknown_override():
    ex = Experiment("t")

    @ex.config
    def config():
        x = 1
        y = x * 2

    captured = {}

    def main(x, y, **rest):
        captured.update(x=x, y=y, extra=rest.get("novel"))
        return x + y

    assert ex.run(main, {"x": 3}) == 9
    assert captured == {"x": 3, "y": 6, "extra": None}
    # overrides absent from the config body still reach **kwargs
    ex.run(main, {"novel": "v"})
    assert captured["extra"] == "v"
