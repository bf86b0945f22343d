#!/usr/bin/env python
"""Convert a reference PyTorch SDDM checkpoint (.pth) into an sddm_tpu
checkpoint (.ckpt) with imported UNetModified2 weights.

Usage:
  python import_torch_checkpoint.py model_best.pth out.ckpt -c config.json

The config supplies the network args (channel_mults / res_blocks /
inner_channel) the checkpoint was trained with.
"""

import argparse

from sddm_tpu.compat import import_unet_modified2_state
from sddm_tpu.train.checkpoints import save_checkpoint
from sddm_tpu.utils import read_json


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("torch_ckpt", type=str)
    parser.add_argument("out_ckpt", type=str)
    parser.add_argument("-c", "--config", required=True, type=str)
    args = parser.parse_args()

    import torch  # host-side only, for unpickling the reference checkpoint

    ckpt = torch.load(args.torch_ckpt, map_location="cpu", weights_only=False)
    state_dict = ckpt.get("state_dict", ckpt)
    config = read_json(args.config)
    net_args = config["network"]["args"]
    if config["network"]["type"] != "UNetModified2":
        raise SystemExit(
            "import currently supports UNetModified2 (the flagship recipe)"
        )

    params = import_unet_modified2_state(
        {k: v.numpy() for k, v in state_dict.items()},
        channel_mults=tuple(net_args.get("channel_mults", (1, 2, 3, 4, 5))),
        res_blocks=net_args.get("res_blocks", 3),
        inner_channel=net_args.get("inner_channel", 32),
    )
    save_checkpoint(
        args.out_ckpt,
        arch="SDDM",
        epoch=int(ckpt.get("epoch", 0)),
        params=params,
        opt_state={},
        monitor_best=float(ckpt.get("monitor_best", 0.0)),
        config=dict(config),
    )
    print(f"wrote {args.out_ckpt}")


if __name__ == "__main__":
    main()
