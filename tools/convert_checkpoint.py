"""Convert the reference torch checkpoints to npz flax variables.

Usage:
    python tools/convert_checkpoint.py \
        /root/reference/smart_tree/model/weights/noble-elevator-58_model_weights.pt \
        smart_tree_tpu/weights/noble-elevator-58.npz
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from smart_tree_tpu.infer.inference import init_template, model_from_state_dict_shapes
from smart_tree_tpu.nn.convert import convert_state_dict, load_torch_weights, save_npz


def main(src: str, dst: str) -> None:
    sd = load_torch_weights(src)
    model = model_from_state_dict_shapes(sd)
    print(
        f"model: planes={model.unet_planes} in={model.input_channels} "
        f"heads r={model.radius_fc_planes} d={model.direction_fc_planes} "
        f"c={model.class_fc_planes}"
    )
    template = init_template(model)
    variables = convert_state_dict(sd, template)
    save_npz(dst, variables)
    print(f"wrote {dst}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
