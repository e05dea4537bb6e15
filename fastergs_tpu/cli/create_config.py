"""Emit a complete default config YAML (host create_config.py equivalent,
reference README.md:120).

Usage: python -m fastergs_tpu.cli.create_config --out my_config.yaml \
           [--dataset-path PATH] [--mcmc]
"""

from __future__ import annotations

import argparse


def default_config(dataset_path: str = 'dataset/mipnerf360/garden',
                   use_mcmc: bool = False) -> dict:
    from fastergs_tpu.engine.trainer import FasterGSTrainer
    from fastergs_tpu.engine.renderer import FasterGSRenderer
    from fastergs_tpu.config import ConfigParameterList

    def to_plain(v):
        return v.to_dict() if isinstance(v, ConfigParameterList) else v

    training = {k: to_plain(v)
                for k, v in FasterGSTrainer._config_defaults.items()}
    renderer = {k: to_plain(v)
                for k, v in FasterGSRenderer._config_defaults.items()}
    if use_mcmc:
        training.update(
            USE_MCMC=True,
            DENSIFICATION_END_ITERATION=24_900,
            MORTON_ORDERING_END_ITERATION=25_000,
        )
        training['LOSS']['LAMBDA_OPACITY_REGULARIZATION'] = 0.01
        training['LOSS']['LAMBDA_SCALE_REGULARIZATION'] = 0.01
        training['OPTIMIZER']['LEARNING_RATE_OPACITIES'] = 0.05
    return {
        'GLOBAL': {'LOG_LEVEL': 2, 'RANDOM_SEED': 0,
                   'DATASET_TYPE': 'MipNeRF360'},
        'MODEL': {'SH_DEGREE': 3},
        'RENDERER': renderer,
        'TRAINING': training,
        'DATASET': {
            'PATH': dataset_path,
            'IMAGE_SCALE_FACTOR': 0.25,
            'BACKGROUND_COLOR': [0.0, 0.0, 0.0],
            'NEAR_PLANE': 0.2,
            'FAR_PLANE': 10000.0,
            'TEST_STEP': 8,
        },
    }


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument('--out', required=True)
    parser.add_argument('--dataset-path', default='dataset/mipnerf360/garden')
    parser.add_argument('--mcmc', action='store_true')
    args = parser.parse_args()

    import yaml
    with open(args.out, 'w') as f:
        yaml.safe_dump(default_config(args.dataset_path, args.mcmc), f,
                       sort_keys=False)
    print(f'wrote {args.out}')


if __name__ == '__main__':
    main()
