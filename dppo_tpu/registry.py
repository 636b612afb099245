"""Mapping from reference `_target_` class paths to dppo_tpu equivalents.

Lets the reference's 279 Hydra YAML configs (`/root/reference/dppo/cfg/**`)
drive this framework unchanged: `config.instantiate` consults this table
before importing. Keys cover every `_target_` that appears in the reference
config tree (`grep -rho "_target_: .*" cfg/`).
"""

TARGET_ALIASES: dict[str, str] = {
    # ---- agents: pretrain ----
    "dppo.agent.pretrain.train_diffusion_agent.TrainDiffusionAgent": "dppo_tpu.agents.pretrain_diffusion.TrainDiffusionAgent",
    "dppo.agent.pretrain.train_gaussian_agent.TrainGaussianAgent": "dppo_tpu.agents.pretrain_gaussian.TrainGaussianAgent",
    # ---- agents: finetune ----
    "dppo.agent.finetune.train_ppo_diffusion_agent.TrainPPODiffusionAgent": "dppo_tpu.agents.finetune_ppo_diffusion.TrainPPODiffusionAgent",
    "dppo.agent.finetune.train_ppo_diffusion_img_agent.TrainPPOImgDiffusionAgent": "dppo_tpu.agents.finetune_ppo_diffusion_img.TrainPPOImgDiffusionAgent",
    "dppo.agent.finetune.train_ppo_diffusion_vis_agent.TrainPPOVisDiffusionAgent": "dppo_tpu.agents.finetune_ppo_diffusion_img.TrainPPOVisDiffusionAgent",
    "dppo.agent.finetune.train_ppo_exact_diffusion_agent.TrainPPOExactDiffusionAgent": "dppo_tpu.agents.finetune_ppo_exact_diffusion.TrainPPOExactDiffusionAgent",
    "dppo.agent.finetune.train_ppo_gaussian_agent.TrainPPOGaussianAgent": "dppo_tpu.agents.finetune_ppo_gaussian.TrainPPOGaussianAgent",
    "dppo.agent.finetune.train_ppo_gaussian_img_agent.TrainPPOImgGaussianAgent": "dppo_tpu.agents.finetune_ppo_gaussian_img.TrainPPOImgGaussianAgent",
    "dppo.agent.finetune.train_ppo_gaussian_vis_agent.TrainPPOVisGaussianAgent": "dppo_tpu.agents.finetune_ppo_gaussian_img.TrainPPOVisGaussianAgent",
    "dppo.agent.finetune.train_rwr_diffusion_agent.TrainRWRDiffusionAgent": "dppo_tpu.agents.finetune_rwr_diffusion.TrainRWRDiffusionAgent",
    "dppo.agent.finetune.train_awr_diffusion_agent.TrainAWRDiffusionAgent": "dppo_tpu.agents.finetune_awr_diffusion.TrainAWRDiffusionAgent",
    "dppo.agent.finetune.train_dql_diffusion_agent.TrainDQLDiffusionAgent": "dppo_tpu.agents.finetune_dql_diffusion.TrainDQLDiffusionAgent",
    "dppo.agent.finetune.train_dipo_diffusion_agent.TrainDIPODiffusionAgent": "dppo_tpu.agents.finetune_dipo_diffusion.TrainDIPODiffusionAgent",
    "dppo.agent.finetune.train_idql_diffusion_agent.TrainIDQLDiffusionAgent": "dppo_tpu.agents.finetune_idql_diffusion.TrainIDQLDiffusionAgent",
    "dppo.agent.finetune.train_qsm_diffusion_agent.TrainQSMDiffusionAgent": "dppo_tpu.agents.finetune_qsm_diffusion.TrainQSMDiffusionAgent",
    "dppo.agent.finetune.train_sac_agent.TrainSACAgent": "dppo_tpu.agents.finetune_sac.TrainSACAgent",
    "dppo.agent.finetune.train_rlpd_agent.TrainRLPDAgent": "dppo_tpu.agents.finetune_rlpd.TrainRLPDAgent",
    "dppo.agent.finetune.train_calql_agent.TrainCalQLAgent": "dppo_tpu.agents.finetune_calql.TrainCalQLAgent",
    "dppo.agent.finetune.train_ibrl_agent.TrainIBRLAgent": "dppo_tpu.agents.finetune_ibrl.TrainIBRLAgent",
    # ---- agents: eval ----
    "dppo.agent.eval.eval_diffusion_agent.EvalDiffusionAgent": "dppo_tpu.agents.eval_diffusion.EvalDiffusionAgent",
    "dppo.agent.eval.eval_diffusion_img_agent.EvalImgDiffusionAgent": "dppo_tpu.agents.eval_diffusion.EvalImgDiffusionAgent",
    "dppo.agent.eval.eval_gaussian_agent.EvalGaussianAgent": "dppo_tpu.agents.eval_gaussian.EvalGaussianAgent",
    "dppo.agent.eval.eval_gaussian_img_agent.EvalImgGaussianAgent": "dppo_tpu.agents.eval_gaussian.EvalImgGaussianAgent",
    # ---- diffusion models ----
    "dppo.model.diffusion.diffusion.DiffusionModel": "dppo_tpu.diffusion.core.DiffusionModel",
    "dppo.model.diffusion.diffusion_ppo.PPODiffusion": "dppo_tpu.diffusion.ppo.PPODiffusion",
    "dppo.model.diffusion.diffusion_ppo_exact.PPOExactDiffusion": "dppo_tpu.diffusion.exact.PPOExactDiffusion",
    "dppo.model.diffusion.diffusion_vpg.VPGDiffusion": "dppo_tpu.diffusion.vpg.VPGDiffusion",
    "dppo.model.diffusion.diffusion_rwr.RWRDiffusion": "dppo_tpu.diffusion.rwr.RWRDiffusion",
    "dppo.model.diffusion.diffusion_awr.AWRDiffusion": "dppo_tpu.diffusion.awr.AWRDiffusion",
    "dppo.model.diffusion.diffusion_dql.DQLDiffusion": "dppo_tpu.diffusion.dql.DQLDiffusion",
    "dppo.model.diffusion.diffusion_dipo.DIPODiffusion": "dppo_tpu.diffusion.dipo.DIPODiffusion",
    "dppo.model.diffusion.diffusion_idql.IDQLDiffusion": "dppo_tpu.diffusion.idql.IDQLDiffusion",
    "dppo.model.diffusion.diffusion_qsm.QSMDiffusion": "dppo_tpu.diffusion.qsm.QSMDiffusion",
    "dppo.model.diffusion.diffusion_eval.DiffusionEval": "dppo_tpu.diffusion.eval.DiffusionEval",
    "dppo.model.diffusion.diffusion_eval_ft.DiffusionEval": "dppo_tpu.diffusion.eval.DiffusionEval",
    # ---- denoiser networks ----
    "dppo.model.diffusion.mlp_diffusion.DiffusionMLP": "dppo_tpu.nets.diffusion_mlp.DiffusionMLP",
    "dppo.model.diffusion.mlp_diffusion.VisionDiffusionMLP": "dppo_tpu.nets.diffusion_mlp.VisionDiffusionMLP",
    "dppo.model.diffusion.unet.Unet1D": "dppo_tpu.nets.unet.Unet1D",
    "dppo.model.diffusion.unet.VisionUnet1D": "dppo_tpu.nets.unet.VisionUnet1D",
    "dppo.model.diffusion.unet.PointUnet1D": "dppo_tpu.nets.unet.PointUnet1D",
    # ---- eta ----
    "dppo.model.diffusion.eta.EtaFixed": "dppo_tpu.diffusion.eta.EtaFixed",
    "dppo.model.diffusion.eta.EtaAction": "dppo_tpu.diffusion.eta.EtaAction",
    "dppo.model.diffusion.eta.EtaState": "dppo_tpu.diffusion.eta.EtaState",
    "dppo.model.diffusion.eta.EtaStateAction": "dppo_tpu.diffusion.eta.EtaStateAction",
    # ---- common nets ----
    "dppo.model.common.mlp.MLP": "dppo_tpu.nets.mlp.MLP",
    "dppo.model.common.mlp.ResidualMLP": "dppo_tpu.nets.mlp.ResidualMLP",
    "dppo.model.common.critic.CriticObs": "dppo_tpu.nets.critic.CriticObs",
    "dppo.model.common.critic.CriticObsAct": "dppo_tpu.nets.critic.CriticObsAct",
    "dppo.model.common.critic.ViTCritic": "dppo_tpu.nets.critic.ViTCritic",
    "dppo.model.common.critic.PointCritic": "dppo_tpu.nets.critic.PointCritic",
    "dppo.model.common.vit.VitEncoder": "dppo_tpu.nets.vit.VitEncoder",
    "dppo.model.common.point_encoder.PointEncoder": "dppo_tpu.nets.point_encoder.PointEncoder",
    "dppo.model.common.point_encoder.PointEncoderSA": "dppo_tpu.nets.point_encoder.PointEncoderSA",
    "dppo.model.common.mlp_gaussian.Gaussian_MLP": "dppo_tpu.nets.gaussian_mlp.GaussianMLP",
    "dppo.model.common.mlp_gaussian.Gaussian_VisionMLP": "dppo_tpu.nets.gaussian_mlp.GaussianVisionMLP",
    "dppo.model.common.mlp_gaussian.Gaussian_PointMLP": "dppo_tpu.nets.gaussian_mlp.GaussianPointMLP",
    "dppo.model.common.mlp_gmm.GMM_MLP": "dppo_tpu.nets.gmm_mlp.GMMMLP",
    "dppo.model.common.transformer.Gaussian_Transformer": "dppo_tpu.nets.transformer.GaussianTransformer",
    "dppo.model.common.transformer.GMM_Transformer": "dppo_tpu.nets.transformer.GMMTransformer",
    # ---- gaussian/gmm policy + RL heads ----
    "dppo.model.common.gaussian.GaussianModel": "dppo_tpu.models.gaussian.GaussianModel",
    "dppo.model.common.gmm.GMMModel": "dppo_tpu.models.gmm.GMMModel",
    "dppo.model.rl.gaussian_vpg.VPG_Gaussian": "dppo_tpu.models.gaussian_vpg.VPGGaussian",
    "dppo.model.rl.gaussian_ppo.PPO_Gaussian": "dppo_tpu.models.gaussian_ppo.PPOGaussian",
    "dppo.model.rl.gmm_vpg.VPG_GMM": "dppo_tpu.models.gmm_vpg.VPGGMM",
    "dppo.model.rl.gmm_ppo.PPO_GMM": "dppo_tpu.models.gmm_ppo.PPOGMM",
    "dppo.model.rl.gaussian_rwr.RWR_Gaussian": "dppo_tpu.models.gaussian_rwr.RWRGaussian",
    "dppo.model.rl.gaussian_awr.AWR_Gaussian": "dppo_tpu.models.gaussian_awr.AWRGaussian",
    "dppo.model.rl.gaussian_sac.SAC_Gaussian": "dppo_tpu.models.gaussian_sac.SACGaussian",
    "dppo.model.rl.gaussian_rlpd.RLPD_Gaussian": "dppo_tpu.models.gaussian_rlpd.RLPDGaussian",
    "dppo.model.rl.gaussian_calql.CalQL_Gaussian": "dppo_tpu.models.gaussian_calql.CalQLGaussian",
    "dppo.model.rl.gaussian_ibrl.IBRL_Gaussian": "dppo_tpu.models.gaussian_ibrl.IBRLGaussian",
    "dppo.model.diffusion.sde_lib.VPSDE": "dppo_tpu.diffusion.sde.VPSDE",
    # ---- data ----
    "dppo.agent.dataset.sequence.StitchedSequenceDataset": "dppo_tpu.data.sequence.StitchedSequenceDataset",
    "dppo.agent.dataset.sequence.StitchedSequenceQLearningDataset": "dppo_tpu.data.sequence.StitchedSequenceQLearningDataset",
    # ---- plotting ----
    "dppo.env.plot_traj.TrajPlotter": "dppo_tpu.envs.plot_traj.TrajPlotter",
    "env.plot_traj.TrajPlotter": "dppo_tpu.envs.plot_traj.TrajPlotter",
}
