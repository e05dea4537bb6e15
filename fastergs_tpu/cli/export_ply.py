"""PLY export CLI (host convert_to_ply.py equivalent, README.md:118).

Usage: python -m fastergs_tpu.cli.export_ply --checkpoint ckpt.npz --out model.ply
"""

from __future__ import annotations

import argparse


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument('--checkpoint', required=True)
    parser.add_argument('--out', required=True)
    parser.add_argument('--sh-degree', type=int, default=3)
    parser.add_argument('--proper-antialiasing', action='store_true')
    args = parser.parse_args()

    from fastergs_tpu.models.gaussians import FasterGSModel
    from fastergs_tpu.models.checkpoint import load_checkpoint
    from fastergs_tpu.models.ply import write_ply
    from fastergs_tpu.utils.logging import log_info

    model = FasterGSModel(sh_degree=args.sh_degree).build()
    load_checkpoint(args.checkpoint, model)
    write_ply(args.out, model.get_ply_dict(args.proper_antialiasing))
    log_info(f'wrote {model.gaussians.n_active:,} Gaussians to {args.out}')


if __name__ == '__main__':
    main()
