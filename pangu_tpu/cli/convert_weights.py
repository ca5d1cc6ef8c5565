"""Offline weight conversion: torch/.onnx pretrained -> orbax params.

Replaces /root/reference/models/onnx2torch.py (run once, offline). The
output directory loads instantly via --pretrained in every other CLI.

Usage:
  python -m pangu_tpu.cli.convert_weights \
      --input /path/pangu_weather_24_torch.pth --output weights/pangu24
  python -m pangu_tpu.cli.convert_weights \
      --input /path/pangu_weather_24.onnx --keys_csv keys_all.csv \
      --output weights/pangu24
"""

from __future__ import annotations

import argparse

import numpy as np

from pangu_tpu.config import PANGU_24
from pangu_tpu.models import convert, pangu
from pangu_tpu.utils.checkpoint import save_params


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True, help=".pth or .onnx weights")
    p.add_argument("--keys_csv", default=None,
                   help="torch->onnx name CSV (required for .onnx)")
    p.add_argument("--output", required=True, help="orbax output directory")
    p.add_argument("--dtype", default="float32",
                   choices=["float32", "bfloat16"])
    p.add_argument("--tiny", action="store_true",
                   help="TINY geometry (tests)")
    args = p.parse_args(argv)

    from pangu_tpu.config import TINY
    cfg = TINY if args.tiny else PANGU_24
    if args.input.endswith(".onnx"):
        if not args.keys_csv:
            raise SystemExit("--keys_csv required for .onnx input")
        params = convert.convert_onnx(args.input, args.keys_csv, cfg,
                                      dtype=np.dtype(args.dtype))
    else:
        params = convert.load_torch_checkpoint(args.input, cfg,
                                               dtype=np.dtype(args.dtype))

    n = pangu.param_count(params)
    save_params(args.output, params)
    print(f"converted {n:,} parameters -> {args.output}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
