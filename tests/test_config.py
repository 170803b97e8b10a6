import os

from p2p_bridge_tpu.utils.config import Config, apply_dot_overrides


def test_attribute_access_and_nesting():
    cfg = Config({"model": {"PVD": {"channels": [32, 64]}}, "lr": 3e-4})
    assert cfg.model.PVD.channels == [32, 64]
    assert cfg.lr == 3e-4
    assert "model" in cfg
    assert "missing" not in cfg
    assert cfg.get("missing", 7) == 7


def test_contains_matches_reference_semantics():
    # reference does `"cond_x1" in cfg.diffusion` (p2pb.py:81)
    cfg = Config({"diffusion": {"ot_ode": True}})
    assert "cond_x1" not in cfg.diffusion
    cfg.diffusion.cond_x1 = True
    assert "cond_x1" in cfg.diffusion


def test_merge_deep():
    a = Config({"x": {"y": 1, "z": 2}, "k": 1})
    a.merge({"x": {"y": 10}, "new": 3})
    assert a.x.y == 10 and a.x.z == 2 and a.new == 3 and a.k == 1


def test_dot_overrides():
    cfg = Config({"training": {"bs": 4}})
    leftover = apply_dot_overrides(
        cfg, ["--training.bs", "32", "--model.ema", "true", "pos"]
    )
    assert cfg.training.bs == 32
    assert cfg.model.ema is True
    assert leftover == ["pos"]


def test_yaml_roundtrip(tmp_path):
    cfg = Config({"a": {"b": [1, 2.5, "s"]}, "flag": False})
    p = os.path.join(tmp_path, "opt.yaml")
    cfg.save(p)
    loaded = Config.load(p)
    assert loaded == cfg


def test_set_dotted_and_select():
    cfg = Config()
    cfg.set_dotted("a.b.c", 5)
    assert cfg.select("a.b.c") == 5
    assert cfg.select("a.b.missing", default=None) is None


def test_parse_args_resume_preserves_name(tmp_path):
    """Resuming via --model_path must keep the checkpoint opt.yaml's
    name: the empty --name CLI default used to clobber it, collapsing
    output_dir = save_dir/name to save_dir (checkpoints then land one
    level up and the segments driver never sees them)."""
    import os

    from p2p_bridge_tpu.utils.args import parse_args

    run = tmp_path / "quality" / "PVDS_PUNet"
    run.mkdir(parents=True)
    (run / "opt.yaml").write_text(
        "name: PVDS_PUNet\n"
        "training:\n  steps: 10\n"
        "diffusion:\n  timesteps: 10\n  sampling_timesteps: 2\n"
        "  sampling_strategy: DDPM\n"
    )
    cfg = parse_args(["--model_path", str(run) + "/",
                      "--save_dir", str(tmp_path / "quality")])
    assert cfg.name == "PVDS_PUNet"
    assert cfg.output_dir == os.path.join(str(tmp_path / "quality"),
                                          "PVDS_PUNet")
    # explicit --name still wins
    cfg2 = parse_args(["--model_path", str(run) + "/",
                       "--save_dir", str(tmp_path / "quality"),
                       "--name", "other"])
    assert cfg2.name == "other"
