"""Manual render check for D3IL envs (parity: `script/test_d3il_render.py`)
— boots the avoiding env, steps random actions, saves a frame. Requires the
d3il simulator package."""

import argparse


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default="render_test.png")
    args = parser.parse_args()
    import imageio
    import numpy as np
    import gym_avoiding  # d3il sim package

    import gym

    env = gym.make("avoiding-v0", render=False)
    env.reset()
    for _ in range(5):
        env.step(np.zeros(env.action_space.shape))
    img = env.render(mode="rgb_array")
    imageio.imwrite(args.out, img)
    print(f"saved {args.out}")


if __name__ == "__main__":
    main()
