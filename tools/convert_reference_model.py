#!/usr/bin/env python
"""Convert a reference PyTorch checkpoint (Final_Model.nn state_dict from
EnterpriseCV-6/Season-NeRF) into this framework's Final_Model.nn artifact, so
reference-trained models can be served/evaluated here directly.

  python tools/convert_reference_model.py --torch_model ref/Final_Model.nn \
      --fc_units 512 --n_classes 4 --out my_dir/Final_Model.nn
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--torch_model", required=True)
    p.add_argument("--fc_units", type=int, default=512)
    p.add_argument("--n_classes", type=int, default=4)
    p.add_argument("--out", required=True)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from season_nerf_tpu.models.tnerf import TNeRF
    from season_nerf_tpu.utils.torch_convert import load_reference_checkpoint
    from season_nerf_tpu.train.state import save_model_artifact

    model = TNeRF(layer_width=args.fc_units, n_classes=args.n_classes)
    template = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 3)),
                          jnp.zeros((2, 3)), jnp.zeros((2, 4)), train=False)
    variables = load_reference_checkpoint(args.torch_model, template)
    save_model_artifact(args.out, variables["params"],
                        variables.get("batch_stats", {}),
                        meta={"fc_units": args.fc_units,
                              "n_classes": args.n_classes,
                              "converted_from": args.torch_model})
    print("wrote", args.out)


if __name__ == "__main__":
    main()
