import os
import textwrap

from point_slam_tpu.config import load_config, update_recursive


def test_update_recursive():
    a = {"x": 1, "nested": {"a": 1, "b": 2}}
    update_recursive(a, {"nested": {"b": 3, "c": 4}, "y": 5})
    assert a == {"x": 1, "nested": {"a": 1, "b": 3, "c": 4}, "y": 5}


def test_inherit_chain(tmp_path):
    (tmp_path / "default.yaml").write_text(textwrap.dedent("""
        model: {c_dim: 32}
        mapping: {iters: 400, pixels: 1000}
    """))
    (tmp_path / "dataset.yaml").write_text(textwrap.dedent(f"""
        inherit_from: {tmp_path}/default.yaml
        mapping: {{pixels: 5000}}
        dataset: replica
    """))
    (tmp_path / "scene.yaml").write_text(textwrap.dedent(f"""
        inherit_from: {tmp_path}/dataset.yaml
        scene: room0
        data: {{input_folder: /x, output: /y}}
    """))
    cfg = load_config(str(tmp_path / "scene.yaml"))
    assert cfg["model"]["c_dim"] == 32
    assert cfg["mapping"]["iters"] == 400
    assert cfg["mapping"]["pixels"] == 5000
    assert cfg["scene"] == "room0"
    assert "tpu" in cfg  # TPU defaults merged in


def test_default_path(tmp_path):
    (tmp_path / "root.yaml").write_text("a: {b: 1}\nc: 2\n")
    (tmp_path / "leaf.yaml").write_text("c: 3\n")
    cfg = load_config(str(tmp_path / "leaf.yaml"), str(tmp_path / "root.yaml"))
    assert cfg["a"]["b"] == 1 and cfg["c"] == 3


def test_reference_config_tree_loads():
    """Our shipped config tree mirrors the reference surface and must load."""
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    scene = os.path.join(here, "configs", "Replica", "room0.yaml")
    default = os.path.join(here, "configs", "point_slam.yaml")
    cfg = load_config(scene, default)
    assert cfg["dataset"] == "replica"
    assert cfg["mapping"]["iters"] == 300
    assert cfg["pointcloud"]["nn_num"] == 8
    assert cfg["rendering"]["N_surface"] == 5
    assert cfg["cam"]["H"] == 680
