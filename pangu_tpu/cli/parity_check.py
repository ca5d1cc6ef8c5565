"""Golden-numerics parity harness against the reference implementation.

Given the converted pretrained weights (and optionally an ERA5 frame or the
reference's published score tables), this validates the port end to end:

  1. structural checks — parameter count/shape audit vs the 223-entry
     reference inventory;
  2. golden forward — run the 24 h step on a saved input frame and compare
     against a saved reference output (produced once with the reference
     PyTorch model or ONNX runtime elsewhere), reporting max|Δ| and
     normalised RMSE per variable;
  3. score parity — run the Jan-2018 eval sweep and diff the 12 CSVs
     against the reference's published Z500/T850 anchor values
     (BASELINE.md; within 0.5% passes the north star).

Without weights it still performs the structural self-checks, so the
harness itself is CI-testable.

Usage:
  python -m pangu_tpu.cli.parity_check --pretrained weights/pangu24 \
      [--frame frame.npz] [--golden reference_output.npz]
  # frame.npz: upper (5,13,721,1440), surface (4,721,1440) float32
  # golden.npz: out_upper, out_surface in physical units
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

ANCHORS = {  # BASELINE.md / fig/tab2.png ONNX row
    "z500_rmse": 45.001,
    "t850_rmse": 0.717,
}


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--pretrained", default=None)
    p.add_argument("--frame", default=None, help=".npz with upper/surface")
    p.add_argument("--golden", default=None,
                   help=".npz with reference out_upper/out_surface")
    p.add_argument("--csv_dir", default=None,
                   help="compare an eval sweep csv dir against the anchors")
    p.add_argument("--dump-activations", default=None, metavar="OUT_NPZ",
                   help="with --frame: save per-stage activations (embed, "
                        "stage0..3, down/upsample, outputs) for offline "
                        "comparison against reference activations")
    p.add_argument("--golden-activations", default=None, metavar="REF_NPZ",
                   help="with --frame: compare per-stage activations "
                        "against a reference dump, reporting the FIRST "
                        "diverging stage (localises any parity break)")
    p.add_argument("--tiny", action="store_true")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from pangu_tpu.config import PANGU_24, TINY
    from pangu_tpu.data.constants import get_constants, denorm_data
    from pangu_tpu.models import convert, pangu
    from pangu_tpu.metrics.score import weighted_rmse_channels

    cfg = TINY if args.tiny else PANGU_24
    ok = True

    # 1. structural audit
    entries = convert.name_map(cfg)
    print(f"[structure] name map entries: {len(entries)} "
          f"(reference keys_all.csv: 223)")
    ok &= len(entries) == 223 or args.tiny

    if args.pretrained:
        from pangu_tpu.cli import common
        ns = argparse.Namespace(pretrained=args.pretrained, keys_csv=None)
        params = common.load_params(ns, type("C", (), {
            "model": cfg, "train": type("T", (), {"seed": 0})})())
        n = pangu.param_count(params)
        print(f"[structure] loaded {n:,} parameters")
        expect = 276_659_936 if not args.tiny else None
        if expect and n != expect:
            print(f"[structure] FAIL: expected {expect:,}")
            ok = False
    else:
        params = pangu.init_params(jax.random.PRNGKey(0), cfg)
        print("[structure] no --pretrained given; using random init "
              "(golden checks will be structural only)")

    constants = {k: jnp.asarray(v) for k, v in get_constants(None, cfg).items()}

    # 2. golden forward
    if args.frame:
        data = np.load(args.frame)
        upper = jnp.asarray(data["upper"])[None]
        surface = jnp.asarray(data["surface"])[None]
        taps = {} if (args.dump_activations
                      or args.golden_activations) else None
        out_u, out_s = pangu.forward(params, upper, surface, constants, cfg,
                                     taps=taps)
        out_u, out_s = denorm_data(out_u, out_s, constants)

        if taps is not None:
            acts = {k: np.asarray(v, np.float32) for k, v in taps.items()}
            acts["out_upper"] = np.asarray(out_u[0], np.float32)
            acts["out_surface"] = np.asarray(out_s[0], np.float32)
        if args.dump_activations:
            np.savez_compressed(args.dump_activations, **acts)
            print(f"[activations] dumped {sorted(acts)} -> "
                  f"{args.dump_activations}")
        if args.golden_activations:
            gold = np.load(args.golden_activations)
            order = ["embed", "stage0", "downsample", "stage1", "stage2",
                     "upsample", "stage3", "out_surface"]
            for name in order:
                if name not in gold:
                    continue
                got = acts[name].squeeze()
                want = np.asarray(gold[name], np.float32).squeeze()
                rel = float(np.abs(got - want).mean()
                            / (np.abs(want).mean() + 1e-6))
                status = "OK" if rel <= 5e-3 else "DIVERGES"
                print(f"[activations] {name}: mean|Δ|/mean|ref| = "
                      f"{rel:.2e} {status}")
                if rel > 5e-3:
                    print(f"[activations] first divergence at {name!r}; "
                          "stages before it are parity-clean")
                    ok = False
                    break
        print(f"[forward] output ranges: upper [{float(out_u.min()):.3g}, "
              f"{float(out_u.max()):.3g}]")
        if args.golden:
            gold = np.load(args.golden)
            for name, got, want in (("upper", out_u[0], gold["out_upper"]),
                                    ("surface", out_s[0],
                                     gold["out_surface"])):
                want = np.asarray(want, np.float32)
                got = np.asarray(got, np.float32)
                denom = np.abs(want).mean() + 1e-6
                rel = float(np.abs(got - want).mean() / denom)
                print(f"[golden] {name}: mean|Δ|/mean|ref| = {rel:.2e}")
                if rel > 5e-3:
                    print(f"[golden] FAIL: {name} relative error > 0.5%")
                    ok = False

    # 3. score anchors
    if args.csv_dir:
        import pandas as pd
        z = pd.read_csv(f"{args.csv_dir}/rmse_upper_z.csv", index_col=0)
        t = pd.read_csv(f"{args.csv_dir}/rmse_upper_t.csv", index_col=0)
        z500 = float(z["500"].mean())
        t850 = float(t["850"].mean())
        for name, got in (("z500_rmse", z500), ("t850_rmse", t850)):
            want = ANCHORS[name]
            rel = abs(got - want) / want
            status = "OK" if rel <= 0.005 else "FAIL"
            print(f"[anchor] {name}: {got:.3f} vs {want:.3f} "
                  f"({100*rel:.2f}%) {status}")
            ok &= rel <= 0.005

    print("PARITY:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
