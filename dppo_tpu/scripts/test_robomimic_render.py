"""Manual render check for robomimic envs (parity:
`script/test_robomimic_render.py`) — boots one env from env_meta, steps a few
random actions, saves a frame. Requires robomimic."""

import argparse
import json


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--env_meta", required=True)
    parser.add_argument("--out", default="render_test.png")
    args = parser.parse_args()
    import imageio
    import numpy as np
    import robomimic.utils.env_utils as EnvUtils

    with open(args.env_meta) as f:
        env_meta = json.load(f)
    env = EnvUtils.create_env_from_metadata(
        env_meta=env_meta, render=False, render_offscreen=True
    )
    env.reset()
    for _ in range(5):
        env.step(np.zeros(env.action_dimension))
    img = env.render(mode="rgb_array", height=256, width=256)
    imageio.imwrite(args.out, img)
    print(f"saved {args.out}")


if __name__ == "__main__":
    main()
