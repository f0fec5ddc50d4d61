"""End-to-end reconstruction validation on the synthetic scene:
SLAM -> TSDF mesh (mesher) -> F-score/depth-L1 vs the ANALYTIC GT box mesh.

The synthetic scene is an axis-aligned box, so the ground-truth surface is
exact; this closes the loop on the whole reconstruction stack (render ->
TSDF fuse -> marching -> eval_recon) with a real metric.
"""
import os, sys, glob, subprocess
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = sorted(glob.glob("/tmp/soak50/*"))[-1] if glob.glob("/tmp/soak50/*") \
    else None


def box_mesh(half, subdiv=64):
    """Triangulated interior surface of the axis-aligned box [-half, half]."""
    hx, hy, hz = half
    verts, faces = [], []

    def add_face(origin, du, dv, n):
        nonlocal_faces = faces  # noqa: F841 (closure is fine; += rebinding was the bug)
        base = len(verts)
        for a in range(n + 1):
            for b in range(n + 1):
                verts.append(origin + du * (a / n) + dv * (b / n))
        for a in range(n):
            for b in range(n):
                i0 = base + a * (n + 1) + b
                i1 = i0 + 1
                i2 = i0 + (n + 1)
                i3 = i2 + 1
                faces.extend([[i0, i1, i2], [i1, i3, i2]])

    o = np.array
    add_face(o([-hx, -hy, -hz]), o([0, 2 * hy, 0]), o([0, 0, 2 * hz]), subdiv)  # x=-hx
    add_face(o([hx, -hy, -hz]), o([0, 2 * hy, 0]), o([0, 0, 2 * hz]), subdiv)   # x=+hx
    add_face(o([-hx, -hy, -hz]), o([2 * hx, 0, 0]), o([0, 0, 2 * hz]), subdiv)  # y=-hy
    add_face(o([-hx, hy, -hz]), o([2 * hx, 0, 0]), o([0, 0, 2 * hz]), subdiv)   # y=+hy
    add_face(o([-hx, -hy, -hz]), o([2 * hx, 0, 0]), o([0, 2 * hy, 0]), subdiv)  # z=-hz
    add_face(o([-hx, -hy, hz]), o([2 * hx, 0, 0]), o([0, 2 * hy, 0]), subdiv)   # z=+hz
    return np.asarray(verts, np.float32), np.asarray(faces, np.int32)


def main():
    assert OUT, "run the soak first (/tmp/soak50)"
    from point_slam_tpu.utils.ply import write_ply
    from point_slam_tpu.tools.eval_recon import calc_3d_metric

    half = [3.0, 2.2, 2.6]
    v, f = box_mesh(half)
    gt_path = "/tmp/gt_box.ply"
    write_ply(gt_path, v, faces=f)
    print(f"GT box mesh: {len(v)} verts {len(f)} faces")

    rec = sorted(glob.glob(os.path.join(OUT, "mesh", "*.ply")))
    if not rec:
        print("building mesh from checkpoint via the mesher CLI...")
        r = subprocess.run(
            [sys.executable, "-m", "point_slam_tpu.tools.mesher",
             "/tmp/soak50.yaml", "--output", OUT, "--no_render"],
            cwd=HERE, capture_output=True, text=True)
        print(r.stdout[-500:], r.stderr[-300:])
        rec = sorted(glob.glob(os.path.join(OUT, "mesh", "*.ply")))
    rec = [p for p in rec if "vertices" not in p]
    print("rec mesh:", rec[-1])

    res = calc_3d_metric(rec[-1], gt_path, threshold=0.01)
    print("3D recon metrics vs FULL box (tau=1cm):", res)

    # the trajectory only observes part of the room — cull the GT mesh to
    # the observed frusta (the reference's cull_mesh step) for a fair score
    from point_slam_tpu.tools.cull_mesh import cull_mesh
    from point_slam_tpu.utils.logger import load_checkpoint
    ck = load_checkpoint(sorted(glob.glob(os.path.join(OUT, "ckpts", "*.npz")))[-1])
    poses = ck["estimate_c2w_list"]
    import yaml
    cam = yaml.safe_load(open("/tmp/soak50.yaml"))["cam"]
    cv, cf, _ = cull_mesh(v, f, poses, H=cam["H"], W=cam["W"], fx=cam["fx"],
                          fy=cam["fy"], cx=cam["cx"], cy=cam["cy"])
    gt_culled = "/tmp/gt_box_culled.ply"
    write_ply(gt_culled, cv, faces=cf)
    print(f"culled GT: {len(cv)} verts {len(cf)} faces")
    res2 = calc_3d_metric(rec[-1], gt_culled, threshold=0.01)
    print("3D recon metrics vs CULLED box (tau=1cm):", res2)


if __name__ == "__main__":
    main()
