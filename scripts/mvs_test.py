#!/usr/bin/env python
"""MVS test-time driver: depth inference + filtering/fusion → point clouds.

Mirrors the reference ``deps/TransMVSNet/test.py`` CLI surface:

    python scripts/mvs_test.py --testpath <root> --testlist scan1,scan2 \
        --ckpt <dir> --outdir outputs/mvs_test --filter_method normal

Per scan it writes the reference's folder protocol —
``<scan>/depth_est/<vid>.pfm``, ``<scan>/confidence/<vid>.pfm`` (the
stage-wise confidence product, test.py:176-179), ``<scan>/cams``,
``<scan>/images`` — then filters by photometric + geometric consistency and
fuses the surviving pixels into ``mvsnet_<scan>.ply``. Fusion backends:
``normal`` (reprojection consistency, test.py:222-386), ``gipuma`` (the
C++/OpenMP fusibile-equivalent), ``dynamic`` (dynamic_fusion.py).
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from diner_tpu.utils.platform import respect_env_platform
respect_env_platform()  # JAX_PLATFORMS=cpu must win over plugin pins


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--testpath", required=True)
    ap.add_argument("--testlist", required=True,
                    help="comma-separated scans or a list file")
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--outdir", default="outputs/mvs_test")
    ap.add_argument("--ndepths", default="48,32,8")
    ap.add_argument("--depth_inter_r", default="4,2,1")
    ap.add_argument("--numdepth", type=int, default=192)
    ap.add_argument("--interval_scale", type=float, default=1.06)
    ap.add_argument("--num_view", type=int, default=5)
    ap.add_argument("--max_h", type=int, default=864)
    ap.add_argument("--max_w", type=int, default=1152)
    ap.add_argument("--fix_res", action="store_true")
    ap.add_argument("--filter_method", default="normal",
                    choices=["normal", "gipuma", "dynamic", "none"])
    ap.add_argument("--conf", type=float, default=0.9,
                    help="photometric confidence threshold")
    ap.add_argument("--thres_view", type=int, default=3)
    ap.add_argument("--max-samples", type=int, default=-1)
    args = ap.parse_args()

    import jax
    import numpy as np

    from diner_tpu.data.io import write_pfm
    from diner_tpu.mvs.eval_datasets import MVSGeneralEvalDataset
    from diner_tpu.mvs.model import TransMVSNet, TransMVSNetConfig
    from diner_tpu.train import checkpoint as ckpt_lib
    from diner_tpu.utils.visual import colorize

    lp = Path(args.testlist)
    scans = ([s for s in lp.read_text().split() if s] if lp.exists()
             else args.testlist.split(","))

    dataset = MVSGeneralEvalDataset(
        args.testpath, scans, "test", nviews=args.num_view,
        ndepths=args.numdepth, interval_scale=args.interval_scale,
        max_h=args.max_h, max_w=args.max_w, fix_res=args.fix_res)

    cfg = TransMVSNetConfig(
        ndepths=tuple(int(x) for x in args.ndepths.split(",")),
        depth_intervals_ratio=tuple(
            float(x) for x in args.depth_inter_r.split(",")))
    model = TransMVSNet(cfg=cfg)

    import jax.numpy as jnp

    @jax.jit
    def infer(variables, imgs, projs, dvals):
        return model.apply(variables, imgs, projs, dvals, False)

    variables = None
    out_root = Path(args.outdir)
    n = len(dataset) if args.max_samples < 0 else min(len(dataset),
                                                      args.max_samples)
    for i in range(n):
        s = dataset[i]
        imgs = jnp.asarray(s["imgs"][None])
        projs = {k: jnp.asarray(v[None])
                 for k, v in s["proj_matrices"].items()}
        dvals = jnp.asarray(s["depth_values"][None])
        if variables is None:
            variables = model.init(jax.random.PRNGKey(0), imgs, projs,
                                   dvals, False)
            if args.ckpt:
                variables = ckpt_lib.restore_checkpoint(args.ckpt, variables)
        out = infer(variables, imgs, projs, dvals)

        depth = np.asarray(out["depth"][0], np.float32)
        H, W = depth.shape
        conf3 = np.asarray(out["photometric_confidence"][0], np.float32)
        conf_final = conf3
        for stage in ("stage1", "stage2"):
            c = np.asarray(out[stage]["photometric_confidence"][0],
                           np.float32)
            from diner_tpu.data.io import resize_bilinear
            conf_final = conf_final * resize_bilinear(c, H, W)

        fn = s["filename"]
        for sub in ("depth_est", "confidence", "cams", "images"):
            (out_root / fn.format(sub, "")).parent.mkdir(
                parents=True, exist_ok=True)
        write_pfm(out_root / fn.format("depth_est", ".pfm"), depth)
        write_pfm(out_root / fn.format("confidence", ".pfm"), conf_final)
        # visualization PNG + ref image + ref cam (reference protocol)
        from PIL import Image
        vis = (colorize(depth) * 255).astype(np.uint8)
        Image.fromarray(vis).save(out_root / fn.format("depth_est", ".png"))
        Image.fromarray((np.clip(s["imgs"][0], 0, 1) * 255).astype(
            np.uint8)).save(out_root / fn.format("images", ".jpg"))
        cam = s["proj_matrices"]["stage3"][0]
        _write_cam(out_root / fn.format("cams", "_cam.txt"), cam,
                   float(dvals[0, 0]),
                   float(dvals[0, 1] - dvals[0, 0]))
        print(f"[{i + 1}/{n}] {fn.format('depth_est', '.pfm')}")

    if args.filter_method == "none":
        return
    for scan in scans:
        _fuse_scan(args, scan, out_root)


def _write_cam(path, cam, depth_min, depth_interval):
    """Reference write_cam format (test.py:111-128)."""
    lines = ["extrinsic"]
    lines += [" ".join(f"{v:.6f}" for v in row) for row in cam[0]]
    lines += ["", "intrinsic"]
    lines += [" ".join(f"{v:.6f}" for v in row) for row in cam[1, :3, :3]]
    lines += ["", f"{depth_min} {depth_interval}"]
    Path(path).write_text("\n".join(lines) + "\n")


def _fuse_scan(args, scan, out_root):
    import numpy as np
    from diner_tpu.data.io import read_pfm, read_rgb
    from diner_tpu.fusion.consistency import (
        filter_and_fuse, filter_and_fuse_dynamic)
    from diner_tpu.fusion.fusion import write_ply
    from diner_tpu.mvs.eval_datasets import read_pair_file

    pair_path = Path(args.testpath) / scan / "pair.txt"
    pairs = read_pair_file(pair_path)
    scan_out = out_root / scan
    view_ids = sorted({r for r, _ in pairs}
                      | {s for _, srcs in pairs for s in srcs})
    id_map = {v: i for i, v in enumerate(view_ids)}

    depths, confs, Ks, Es, images = [], [], [], [], []
    for vid in view_ids:
        depths.append(np.asarray(
            read_pfm(scan_out / "depth_est" / f"{vid:08d}.pfm")[0],
            np.float32))
        confs.append(np.asarray(
            read_pfm(scan_out / "confidence" / f"{vid:08d}.pfm")[0],
            np.float32))
        K, E = _read_cam(scan_out / "cams" / f"{vid:08d}_cam.txt")
        Ks.append(K)
        Es.append(E)
        images.append(read_rgb(scan_out / "images" / f"{vid:08d}.jpg"))

    idx_pairs = [(id_map[r], [id_map[s] for s in srcs
                              if s in id_map]) for r, srcs in pairs]
    ply_path = out_root / f"mvsnet_{scan}.ply"
    if args.filter_method == "gipuma":
        from diner_tpu.fusion import fuse_depth_maps
        from diner_tpu.fusion.fusion import fake_normals, probability_filter
        d = np.stack([probability_filter(dd, cc, args.conf)
                      for dd, cc in zip(depths, confs)])
        normals = np.stack([fake_normals(dd) for dd in d])
        Ps = np.stack([(K @ E[:3]).astype(np.float32)
                       for K, E in zip(Ks, Es)])
        pts = fuse_depth_maps(d, normals, Ps,
                              np.asarray([K[0, 0] for K in Ks], np.float32),
                              np.stack(images),
                              num_consistent=args.thres_view)
        write_ply(ply_path, pts)
        print(f"fused {scan}: {len(pts)} points -> {ply_path}")
        return
    if args.filter_method == "dynamic":
        pts, colors, _ = filter_and_fuse_dynamic(
            depths, confs, Ks, Es, idx_pairs, images=images,
            photo_threshold=0.3, thres_view=args.thres_view)
    else:
        pts, colors, _ = filter_and_fuse(
            depths, confs, Ks, Es, idx_pairs, images=images,
            conf_thresh=args.conf, thres_view=args.thres_view)
    pts9 = np.concatenate(
        [pts, np.zeros_like(pts),
         colors if colors is not None else np.zeros_like(pts)], axis=1)
    write_ply(ply_path, pts9, with_normals=False,
              with_colors=colors is not None)
    print(f"fused {scan}: {len(pts)} points -> {ply_path}")


def _read_cam(path):
    import numpy as np
    lines = [ln.rstrip() for ln in Path(path).read_text().splitlines()]
    E = np.fromstring(" ".join(lines[1:5]), dtype=np.float32,
                      sep=" ").reshape(4, 4)
    K = np.fromstring(" ".join(lines[7:10]), dtype=np.float32,
                      sep=" ").reshape(3, 3)
    return K, E


if __name__ == "__main__":
    main()
