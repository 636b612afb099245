"""TPU-resident env backend (dppo_tpu/envs/device/).

Golden tests: (1) the Pendulum device task reproduces gymnasium's
Pendulum-v1 dynamics step for step; (2) DevicePool's pure-function chunk
stepping matches the host MultiStep wrapper (termination, truncation budget,
reward sums, obs history, auto-reset, final_obs) on identical deterministic
dynamics; (3) the DeviceVectorEnv adapter keeps the venv API contract;
(4) the fused DPPO device agent trains end-to-end through the shipped cfg.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dppo_tpu.config import get_class, load_config
from dppo_tpu.envs.device import (
    DevicePool,
    DeviceVectorEnv,
    LinearTask,
    PendulumTask,
    make_device_task,
)
from dppo_tpu.envs.multi_step import MultiStep

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


# ---------------------------------------------------------------- pendulum
def test_pendulum_matches_gymnasium():
    gymnasium = pytest.importorskip("gymnasium")
    from dppo_tpu.envs.wrappers.mujoco_locomotion import normalize_obs

    env = gymnasium.make("Pendulum-v1").unwrapped
    task = PendulumTask()
    pool = DevicePool(task, n_envs=1, n_obs_steps=1, n_action_steps=1,
                      max_episode_steps=200)
    st = pool.reset_all(jax.random.key(0))
    th, thdot = 1.234, -0.567
    env.reset(seed=0)
    env.state = np.array([th, thdot])
    st = st._replace(
        phys=st.phys._replace(
            th=jnp.asarray([th]), thdot=jnp.asarray([thdot])
        )
    )
    step = jax.jit(pool.step_chunk)
    rng = np.random.default_rng(42)
    for _ in range(30):
        a = rng.uniform(-1, 1, size=(1, 1, 1)).astype(np.float32)
        st, out = step(st, jnp.asarray(a))
        o_gym, r_gym, *_ = env.step(np.array([a[0, 0, 0] * 2.0]))
        o_gym_n = normalize_obs(
            o_gym, np.array([-1.0, -1.0, -8.0]), np.array([1.0, 1.0, 8.0])
        )
        np.testing.assert_allclose(
            np.asarray(out.obs)[0, 0], o_gym_n, atol=1e-4
        )
        np.testing.assert_allclose(
            float(out.reward[0]), float(r_gym), atol=1e-4
        )
        assert not bool(out.terminated[0])


def test_pendulum_reset_bounds():
    task = PendulumTask()
    pool = DevicePool(task, n_envs=256, n_obs_steps=1, n_action_steps=1)
    st = pool.reset_all(jax.random.key(3))
    th = np.asarray(st.phys.th)
    thdot = np.asarray(st.phys.thdot)
    assert np.all(np.abs(th) <= np.pi) and np.all(np.abs(thdot) <= 1.0)
    # spread over the range, not degenerate
    assert th.std() > 1.0 and thdot.std() > 0.3


# --------------------------------------------- MultiStep semantics golden
class _HostLinearEnv:
    """Host twin of LinearTask (fixed reset) behind the task-wrapper API."""

    def __init__(self, task: LinearTask):
        self.W = np.asarray(task.W)
        self.A = np.asarray(task.A)
        self.Ba = np.asarray(task.Ba)
        self.x0 = np.asarray(task.x0)
        self.thresh = task.terminate_norm

    def seed(self, seed=None):
        pass

    def reset(self, seed=None, options=None):
        self.state = self.x0.copy()
        return {"state": self.state.copy()}

    def step(self, action):
        a = np.asarray(action, np.float32)
        target = np.tanh(self.state @ self.W)
        reward = float(np.exp(-np.sum((a - target) ** 2)))
        self.state = np.tanh(self.state @ self.A + a @ self.Ba)
        term = (
            bool(np.max(np.abs(self.state)) > self.thresh)
            if self.thresh is not None
            else False
        )
        return {"state": self.state.copy()}, reward, term, False, {}

    def close(self):
        pass


@pytest.mark.parametrize("terminate_norm", [None, 0.9])
def test_device_multistep_matches_host_wrapper(terminate_norm):
    """DevicePool.step_chunk vs the host MultiStep wrapper on identical
    deterministic dynamics: same obs histories, rewards, terminated,
    truncated, final_obs, across episode boundaries with auto-reset."""
    To, S, budget = 2, 3, 7
    task = LinearTask(
        obs_dim=4, action_dim=2, terminate_norm=terminate_norm,
        reset_mode="fixed",
    )
    n_envs = 2
    pool = DevicePool(
        task, n_envs=n_envs, n_obs_steps=To, n_action_steps=S,
        max_episode_steps=budget, reset_within_step=True,
    )
    st = pool.reset_all(jax.random.key(0))
    step = jax.jit(pool.step_chunk)

    hosts = [
        MultiStep(
            _HostLinearEnv(task), n_obs_steps=To, n_action_steps=S,
            max_episode_steps=budget, reset_within_step=True,
        )
        for _ in range(n_envs)
    ]
    host_obs = np.stack([h.reset()["state"] for h in hosts])
    np.testing.assert_allclose(np.asarray(st.hist), host_obs, atol=1e-5)

    rng = np.random.default_rng(7)
    for chunk in range(12):
        acts = rng.uniform(-1, 1, size=(n_envs, S, 2)).astype(np.float32)
        st, out = step(st, jnp.asarray(acts))
        for e in range(n_envs):
            obs_h, r_h, term_h, trunc_h, info_h = hosts[e].step(acts[e])
            np.testing.assert_allclose(
                np.asarray(out.obs)[e], obs_h["state"], atol=1e-5,
                err_msg=f"chunk {chunk} env {e} obs",
            )
            np.testing.assert_allclose(
                float(out.reward[e]), r_h, atol=1e-5,
                err_msg=f"chunk {chunk} env {e} reward",
            )
            assert bool(out.terminated[e]) == term_h, (chunk, e)
            assert bool(out.truncated[e]) == trunc_h, (chunk, e)
            if trunc_h:
                np.testing.assert_allclose(
                    np.asarray(out.final_obs)[e],
                    info_h["final_obs"]["state"],
                    atol=1e-5,
                )


def test_device_multistep_budget_exact():
    """Budget bookkeeping: with max_episode_steps=7 and chunks of 3, the
    third chunk truncates after one substep (7 = 3+3+1), reward covers only
    executed substeps, and cnt resets on auto-reset."""
    task = LinearTask(obs_dim=3, action_dim=2, reset_mode="fixed")
    pool = DevicePool(
        task, n_envs=1, n_obs_steps=1, n_action_steps=3,
        max_episode_steps=7, reset_within_step=True,
    )
    st = pool.reset_all(jax.random.key(0))
    acts = jnp.zeros((1, 3, 2))
    st, o1 = pool.step_chunk(st, acts)
    st, o2 = pool.step_chunk(st, acts)
    st, o3 = pool.step_chunk(st, acts)
    assert not bool(o1.truncated[0]) and not bool(o2.truncated[0])
    assert bool(o3.truncated[0]) and not bool(o3.terminated[0])
    assert int(st.cnt[0]) == 0  # auto-reset
    # single substep executed in chunk 3: reward is one substep's worth
    assert float(o3.reward[0]) < float(o2.reward[0])
    # post-reset obs is the fixed initial state again
    np.testing.assert_allclose(
        np.asarray(o3.obs)[0, 0], np.asarray(task.x0), atol=1e-6
    )


# ----------------------------------------------------------------- adapter
def test_adapter_venv_api():
    task = LinearTask(obs_dim=4, action_dim=2, reset_mode="normal")
    venv = DeviceVectorEnv(
        task, n_envs=3, n_obs_steps=2, n_action_steps=2,
        max_episode_steps=4, reset_within_step=True, seed=0,
    )
    venv.seed([10, 11, 12])
    obs = venv.reset_arg()
    assert obs["state"].shape == (3, 2, 4)
    # same seeds -> same reset draw
    venv2 = DeviceVectorEnv(
        task, n_envs=3, n_obs_steps=2, n_action_steps=2,
        max_episode_steps=4, reset_within_step=True, seed=0,
    )
    venv2.seed([10, 11, 12])
    np.testing.assert_array_equal(obs["state"], venv2.reset_arg()["state"])

    acts = np.zeros((3, 2, 2), np.float32)
    venv.step_async(acts)
    with pytest.raises(RuntimeError):
        venv.step_async(acts)
    obs, r, term, trunc, infos = venv.step_wait()
    with pytest.raises(RuntimeError):
        venv.step_wait()
    assert r.shape == (3,) and term.dtype == bool
    # truncation after 2 chunks (budget 4, S=2) -> final_obs in infos
    obs, r, term, trunc, infos = venv.step(acts)
    assert trunc.all()
    assert all("final_obs" in d for d in infos)
    assert infos[0]["final_obs"]["state"].shape == (2, 4)
    one = venv.reset_one_arg(1)
    assert one["state"].shape == (2, 4)
    venv.close()


def test_make_async_device_backend():
    from dppo_tpu.envs import make_async

    venv = make_async(
        "pendulum-v1",
        num_envs=4,
        backend="device",
        max_episode_steps=8,
        wrappers={
            "mujoco_locomotion_lowdim": {"normalization_path": None},
            "multi_step": {
                "n_obs_steps": 1,
                "n_action_steps": 2,
                "max_episode_steps": 8,
                "reset_within_step": True,
            },
        },
        obs_dim=3,
        action_dim=1,
    )
    assert isinstance(venv, DeviceVectorEnv)
    venv.seed(list(range(4)))
    obs = venv.reset_arg()
    assert obs["state"].shape == (4, 1, 3)
    obs, r, term, trunc, infos = venv.step(np.zeros((4, 2, 1), np.float32))
    assert np.all(r < 0)  # pendulum rewards are negative
    with pytest.raises(NotImplementedError):
        make_async(
            "pendulum-v1", num_envs=1, backend="device",
            wrappers={"multi_step": {"reward_agg_method": "max"}},
        )
    with pytest.raises(NotImplementedError):
        make_async(
            "pendulum-v1", num_envs=1, backend="device",
            wrappers={"multi_step": {"pass_full_observations": True}},
        )


def test_mjx_gate():
    try:
        from mujoco import mjx  # noqa: F401

        pytest.skip("mujoco-mjx installed; gate not exercised")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError, match="mujoco-mjx"):
        make_device_task(
            "mjx:hopper-medium-v2", normalization_path="/dev/null"
        )


def test_unknown_device_task():
    with pytest.raises(ValueError, match="unknown device task"):
        make_device_task("robomimic-can")


def test_host_agent_drives_device_env(tmp_path):
    """Unmodified host agents work on device envs through the adapter: a
    Gaussian PPO fine-tune loop (per-macro-step dispatch) on the linear
    device task."""
    from dppo_tpu.config import Config

    obs_dim, action_dim = 6, 2
    cfg = Config(
        {
            "_target_": "dppo.agent.finetune.train_ppo_gaussian_agent.TrainPPOGaussianAgent",
            "logdir": str(tmp_path / "log"),
            "seed": 0,
            "obs_dim": obs_dim,
            "action_dim": action_dim,
            "cond_steps": 1,
            "horizon_steps": 2,
            "act_steps": 2,
            "wandb": None,
            "env": Config(
                {
                    "n_envs": 4,
                    "name": "linear",
                    "backend": "device",
                    "max_episode_steps": 8,
                    "reset_at_iteration": False,
                    "best_reward_threshold_for_success": 0.5,
                    "wrappers": Config(
                        {
                            "multi_step": Config(
                                {
                                    "n_obs_steps": 1,
                                    "n_action_steps": 2,
                                    "max_episode_steps": 8,
                                    "reset_within_step": True,
                                }
                            )
                        }
                    ),
                }
            ),
            "train": Config(
                {
                    "n_train_itr": 2,
                    "n_critic_warmup_itr": 0,
                    "n_steps": 5,
                    "gamma": 0.99,
                    "actor_lr": 1e-4,
                    "actor_weight_decay": 0,
                    "actor_lr_scheduler": Config(
                        {"first_cycle_steps": 10, "warmup_steps": 1,
                         "min_lr": 1e-5}
                    ),
                    "critic_lr": 1e-3,
                    "critic_weight_decay": 0,
                    "critic_lr_scheduler": Config(
                        {"first_cycle_steps": 10, "warmup_steps": 1,
                         "min_lr": 1e-4}
                    ),
                    "save_model_freq": 10,
                    "val_freq": 10,
                    "render": Config({"freq": 1, "num": 0}),
                    "reward_scale_running": True,
                    "reward_scale_const": 1.0,
                    "gae_lambda": 0.95,
                    "batch_size": 16,
                    "update_epochs": 2,
                    "vf_coef": 0.5,
                    "target_kl": 1.0,
                }
            ),
            "model": Config(
                {
                    "_target_": "dppo.model.rl.gaussian_ppo.PPO_Gaussian",
                    "clip_ploss_coef": 0.1,
                    "randn_clip_value": 3,
                    "network_path": None,
                    "actor": Config(
                        {
                            "_target_": "dppo.model.common.mlp_gaussian.Gaussian_MLP",
                            "mlp_dims": [32, 32],
                            "fixed_std": 0.1,
                            "cond_dim": obs_dim,
                            "horizon_steps": 2,
                            "action_dim": action_dim,
                        }
                    ),
                    "critic": Config(
                        {
                            "_target_": "dppo.model.common.critic.CriticObs",
                            "cond_dim": obs_dim,
                            "mlp_dims": [32, 32],
                        }
                    ),
                    "horizon_steps": 2,
                }
            ),
        }
    )
    agent = get_class(cfg._target_)(cfg)
    agent.run()
    assert agent.itr == 2
    import jax.tree_util as jtu

    leaves = jtu.tree_leaves(agent.update_state.params.actor_ft)
    assert all(bool(np.isfinite(np.asarray(l)).all()) for l in leaves)


# ------------------------------------------------------- fused DPPO agent
@pytest.fixture(scope="module")
def pendulum_assets(tmp_path_factory):
    pytest.importorskip("gymnasium")
    from dppo_tpu.data.synthetic import collect_gym_demos

    root = str(tmp_path_factory.mktemp("pendulum"))
    collect_gym_demos(
        "pendulum-v1",
        f"{root}/gym/pendulum-v1/train.npz",
        f"{root}/gym/pendulum-v1/normalization.npz",
        n_episodes=3,
        max_steps=60,
    )
    return root


def test_fused_device_dppo_e2e(pendulum_assets, monkeypatch):
    """Shipped pendulum cfgs: pretrain -> fused device finetune. The whole
    train iteration (rollout scan + PPO update) is one jitted program."""
    root = pendulum_assets
    monkeypatch.setenv("DPPO_DATA_DIR", root)
    monkeypatch.setenv("DPPO_LOG_DIR", root)

    cfg = load_config(
        os.path.join(REPO, "cfg/gym/pretrain/pendulum-v1/pre_diffusion_mlp.yaml"),
        overrides=[
            "train.n_epochs=2",
            "train.batch_size=32",
            "train.save_model_freq=2",
            "denoising_steps=4",
            "model.network.mlp_dims=[32, 32, 32]",
            "model.network.time_dim=8",
            f"logdir={root}/pre",
        ],
    )
    get_class(cfg._target_)(cfg).run()

    cfg = load_config(
        os.path.join(REPO, "cfg/gym/finetune/pendulum-v1/ft_ppo_diffusion_mlp.yaml"),
        overrides=[
            f"base_policy_path={root}/pre/checkpoint/state_2.pkl",
            "denoising_steps=4",
            "ft_denoising_steps=2",
            "env.n_envs=4",
            "env.max_episode_steps=16",
            "train.n_steps=6",
            "train.n_train_itr=3",
            "train.val_freq=3",
            "train.batch_size=24",
            "train.save_model_freq=10",
            "model.actor.mlp_dims=[32, 32, 32]",
            "model.actor.time_dim=8",
            "model.critic.mlp_dims=[32, 32, 32]",
            f"logdir={root}/ft",
        ],
    )
    agent = get_class(cfg._target_)(cfg)
    agent.run()

    import pickle

    with open(f"{root}/ft/result.pkl", "rb") as f:
        rows = pickle.load(f)
    assert len(rows) == 3
    train_rows = [r for r in rows if "train_episode_reward" in r]
    # max_episode_steps=16 with act 4 -> episodes finish inside 6 macro-steps
    assert train_rows and all(
        np.isfinite(r["train_episode_reward"]) and r["train_episode_reward"] < 0
        for r in train_rows
    )
    assert os.path.exists(f"{root}/ft/checkpoint/full_state_2.pkl")


def test_fused_device_gaussian_e2e(pendulum_assets, monkeypatch):
    """Shipped pendulum Gaussian cfgs: pretrain -> fused device finetune.
    Exercises the shared DeviceFusedMixin loop with the Gaussian-family
    record (action chunks instead of denoising chains)."""
    root = pendulum_assets
    monkeypatch.setenv("DPPO_DATA_DIR", root)
    monkeypatch.setenv("DPPO_LOG_DIR", root)

    cfg = load_config(
        os.path.join(REPO, "cfg/gym/pretrain/pendulum-v1/pre_gaussian_mlp.yaml"),
        overrides=[
            "train.n_epochs=2",
            "train.batch_size=32",
            "train.save_model_freq=2",
            "model.network.mlp_dims=[32, 32, 32]",
            f"logdir={root}/pre_gauss",
        ],
    )
    get_class(cfg._target_)(cfg).run()

    cfg = load_config(
        os.path.join(REPO, "cfg/gym/finetune/pendulum-v1/ft_ppo_gaussian_mlp.yaml"),
        overrides=[
            f"base_policy_path={root}/pre_gauss/checkpoint/state_2.pkl",
            "env.n_envs=4",
            "env.max_episode_steps=16",
            "train.n_steps=6",
            "train.n_train_itr=3",
            "train.val_freq=3",
            "train.batch_size=24",
            "train.save_model_freq=10",
            "model.actor.mlp_dims=[32, 32, 32]",
            "model.critic.mlp_dims=[32, 32, 32]",
            f"logdir={root}/ft_gauss",
        ],
    )
    agent = get_class(cfg._target_)(cfg)
    agent.run()

    import pickle

    with open(f"{root}/ft_gauss/result.pkl", "rb") as f:
        rows = pickle.load(f)
    assert len(rows) == 3
    train_rows = [r for r in rows if "train_episode_reward" in r]
    assert train_rows and all(
        np.isfinite(r["train_episode_reward"]) and r["train_episode_reward"] < 0
        for r in train_rows
    )
    import jax.tree_util as jtu

    leaves = jtu.tree_leaves(agent.update_state.params.actor_ft)
    assert all(bool(np.isfinite(np.asarray(l)).all()) for l in leaves)


def test_fused_device_gmm_ppo(tmp_path):
    """The Gaussian fused device agent serves GMM policies unchanged (the
    model interface is identical): one dispatch per iteration on the
    linear device task."""
    from dppo_tpu.config import Config
    from tests.test_offpolicy import _device_env_cfg

    obs_dim, action_dim = 5, 2
    cfg = Config(
        {
            "_target_": "dppo_tpu.agents.finetune_ppo_gaussian_device.TrainPPOGaussianDeviceAgent",
            "logdir": str(tmp_path / "log"),
            "seed": 0,
            "obs_dim": obs_dim,
            "action_dim": action_dim,
            "cond_steps": 1,
            "horizon_steps": 2,
            "act_steps": 2,
            "wandb": None,
            "env": _device_env_cfg(),
            "train": Config(
                {
                    "n_train_itr": 2,
                    "n_critic_warmup_itr": 0,
                    "n_steps": 5,
                    "gamma": 0.99,
                    "actor_lr": 1e-4,
                    "actor_weight_decay": 0,
                    "actor_lr_scheduler": Config(
                        {"first_cycle_steps": 10, "warmup_steps": 1,
                         "min_lr": 1e-5}
                    ),
                    "critic_lr": 1e-3,
                    "critic_weight_decay": 0,
                    "critic_lr_scheduler": Config(
                        {"first_cycle_steps": 10, "warmup_steps": 1,
                         "min_lr": 1e-4}
                    ),
                    "save_model_freq": 10,
                    "val_freq": 10,
                    "render": Config({"freq": 1, "num": 0}),
                    "reward_scale_running": True,
                    "reward_scale_const": 1.0,
                    "gae_lambda": 0.95,
                    "batch_size": 16,
                    "update_epochs": 2,
                    "vf_coef": 0.5,
                    "target_kl": 1.0,
                }
            ),
            "model": Config(
                {
                    "_target_": "dppo.model.rl.gmm_ppo.PPO_GMM",
                    "clip_ploss_coef": 0.1,
                    "network_path": None,
                    "actor": Config(
                        {
                            "_target_": "dppo.model.common.mlp_gmm.GMM_MLP",
                            "mlp_dims": [32, 32],
                            "num_modes": 3,
                            "fixed_std": 0.1,
                            "cond_dim": obs_dim,
                            "horizon_steps": 2,
                            "action_dim": action_dim,
                        }
                    ),
                    "critic": Config(
                        {
                            "_target_": "dppo.model.common.critic.CriticObs",
                            "cond_dim": obs_dim,
                            "mlp_dims": [32, 32],
                        }
                    ),
                    "horizon_steps": 2,
                }
            ),
        }
    )
    agent = get_class(cfg._target_)(cfg)
    agent.run()
    assert agent.itr == 2
    leaves = jax.tree_util.tree_leaves(agent.update_state.params.actor_ft)
    assert all(bool(np.isfinite(np.asarray(l)).all()) for l in leaves)


def test_fused_device_gaussian_rejects_host_env(tmp_path, monkeypatch):
    monkeypatch.setenv("DPPO_DATA_DIR", str(tmp_path))
    monkeypatch.setenv("DPPO_LOG_DIR", str(tmp_path))
    cfg = load_config(
        os.path.join(REPO, "cfg/gym/finetune/pendulum-v1/ft_ppo_gaussian_mlp.yaml"),
        overrides=[
            "env.wrappers.multi_step.reset_within_step=false",
            "env.n_envs=2",
            f"logdir={tmp_path}/ft",
        ],
    )
    with pytest.raises(ValueError, match="reset_within_step"):
        get_class(cfg._target_)(cfg)


def test_fused_device_sac_e2e(pendulum_assets, monkeypatch):
    """Shipped pendulum SAC device cfg: blocks of (env step + conditional
    critic/actor updates) fused into single dispatches, cut at the explore/
    val/log/save boundaries. Covers the explore->train transition, eval
    mode, and variable block sizes."""
    root = pendulum_assets
    monkeypatch.setenv("DPPO_DATA_DIR", root)
    monkeypatch.setenv("DPPO_LOG_DIR", root)

    cfg = load_config(
        os.path.join(REPO, "cfg/gym/scratch/pendulum-v1/sac_mlp.yaml"),
        overrides=[
            "env.n_envs=4",
            "env.max_episode_steps=16",
            "train.n_train_itr=30",
            "train.n_explore_steps=5",
            "train.block_iters=10",
            "train.val_freq=20",
            "train.log_freq=10",
            "train.save_model_freq=30",
            "train.batch_size=32",
            "train.buffer_size=512",
            "model.actor.mlp_dims=[32, 32]",
            "model.critic.mlp_dims=[32, 32]",
            f"logdir={root}/sac_dev",
        ],
    )
    agent = get_class(cfg._target_)(cfg)
    agent.run()
    assert agent.itr >= 30
    import pickle

    with open(f"{root}/sac_dev/result.pkl", "rb") as f:
        rows = pickle.load(f)
    evals = [r for r in rows if "eval_episode_reward" in r]
    trains = [r for r in rows if "train_episode_reward" in r]
    # replay saw one insert of n_envs rows per train iteration; eval
    # iterations consume an iteration index but insert nothing (host parity)
    assert int(agent.replay.size) == (agent.itr - len(evals)) * 4
    assert evals and trains
    assert all(np.isfinite(r["train_episode_reward"]) for r in trains)
    import jax.tree_util as jtu

    assert all(
        bool(np.isfinite(np.asarray(l)).all())
        for l in jtu.tree_leaves(agent.state.params)
    )


def test_fused_device_sac_rejects_host_env(tmp_path, monkeypatch):
    monkeypatch.setenv("DPPO_DATA_DIR", str(tmp_path))
    monkeypatch.setenv("DPPO_LOG_DIR", str(tmp_path))
    cfg = load_config(
        os.path.join(REPO, "cfg/gym/scratch/pendulum-v1/sac_mlp.yaml"),
        overrides=[
            "env.backend=process",
            f"logdir={tmp_path}/sac",
        ],
    )
    with pytest.raises(ValueError, match="backend=device"):
        get_class(cfg._target_)(cfg)


def test_fused_device_agent_rejects_host_env(tmp_path, monkeypatch):
    monkeypatch.setenv("DPPO_DATA_DIR", str(tmp_path))
    monkeypatch.setenv("DPPO_LOG_DIR", str(tmp_path))
    cfg = load_config(
        os.path.join(REPO, "cfg/gym/finetune/pendulum-v1/ft_ppo_diffusion_mlp.yaml"),
        overrides=[
            "env.wrappers.multi_step.reset_within_step=false",
            "env.n_envs=2",
            f"logdir={tmp_path}/ft",
        ],
    )
    # required for the fused scan: episodes must restart inside the pool
    with pytest.raises(ValueError, match="reset_within_step"):
        # base_policy_path isn't touched before the env check
        get_class(cfg._target_)(cfg)
