"""VQA reward, length-grouped sampler, env report, CLI arg parsing."""

import numpy as np

from mixgrpo_tpu.data.sampler import LengthGroupedSampler, length_grouped_indices
from mixgrpo_tpu.rewards.vqa import VQAScorer, is_answer_match
from mixgrpo_tpu.utils.env import collect_env


def test_is_answer_match_forms():
    gold = "(b) 7 years"
    assert is_answer_match("(b) 7 years", gold)
    assert is_answer_match("(B)", gold)
    assert is_answer_match("7 years", gold)
    assert is_answer_match("b", gold)
    assert is_answer_match("  B  ", gold)
    assert not is_answer_match("(a) 5 years", gold)
    assert not is_answer_match("blah b blah", gold)
    assert not is_answer_match("7", gold)


def test_vqa_scorer_fraction():
    answers = {"Is there a cat?": "(a) yes", "What color?": "(b) red"}

    def vlm(image, question_text):
        for q, a in answers.items():
            if q in question_text:
                # first image answers correctly, second gets it wrong
                return a if image == "img0" else "(c) wrong"
        return "?"

    scorer = VQAScorer(vlm)
    meta = [{
        "qa": {
            "relation": [{"question": "Is there a cat?", "answer": "(a) yes"}],
            "attribute": [{"question": "What color?", "answer": "(b) red"}],
        }
    }] * 2
    scores, ok = scorer(["img0", "img1"], ["p", "p"], meta)
    np.testing.assert_allclose(scores, [1.0, 0.0])
    assert ok == [1.0, 1.0]


def test_vqa_scorer_partial():
    def vlm(image, question_text):
        return "(a) yes"  # always answers (a)

    scorer = VQAScorer(vlm)
    meta = [{
        "qa": {
            "relation": [{"question": "q1", "answer": "(a) yes"}],
            "attribute": [{"question": "q2", "answer": "(b) no"}],
        }
    }]
    scores, _ = scorer(["x"], ["p"], meta)
    np.testing.assert_allclose(scores, [0.5])


def test_length_grouped_sampler():
    rng = np.random.default_rng(0)
    lengths = rng.integers(1, 100, size=40).tolist()
    idx = length_grouped_indices(lengths, batch_size=4, world_size=1,
                                 generator=np.random.default_rng(1),
                                 mega_batch_mult=2)
    assert sorted(idx) == list(range(40))
    # first element is the global longest
    assert lengths[idx[0]] == max(lengths)
    # within each megabatch of 8, lengths descend
    for i in range(0, 40, 8):
        mb = [lengths[j] for j in idx[i : i + 8]]
        assert mb == sorted(mb, reverse=True)

    s = LengthGroupedSampler(lengths, 4, seed=5)
    assert s.epoch(0) == s.epoch(0)
    assert s.epoch(0) != s.epoch(1)


def test_env_report():
    info = collect_env()
    assert "jax" in info and "python" in info


def test_cli_flag_surface():
    """Reference flag names parse into the config (train_grpo_flux.py:894+)."""
    from mixgrpo_tpu.config import build_arg_parser, config_from_args

    p = build_arg_parser()
    args = p.parse_args([
        "--data_json_path", "/d", "--train_batch_size", "2",
        "--num_generations", "12", "--sampling_steps", "25",
        "--eta", "0.7", "--shift", "3", "--training_strategy", "part",
        "--iters_per_group", "25", "--group_size", "4",
        "--sample_strategy", "progressive", "--prog_overlap",
        "--roll_back", "--flow_grpo_sampling", "--use_group",
        "--init_same_noise", "--learning_rate", "1e-5",
        "--gradient_accumulation_steps", "3", "--clip_range", "1e-4",
        "--adv_clip_max", "5", "--kl_coeff", "0.0",
        "--reward_model", "multi_reward", "--multi_reward_mix",
        "advantage_aggr", "--hps_weight", "1.0",
        "--dpm_algorithm_type", "dpmsolver++", "--dpm_solver_order", "2",
        "--dpm_solver_type", "midpoint", "--dpm_post_compress_ratio", "0.4",
        "--h", "720", "--w", "720", "--max_train_steps", "300",
        "--checkpointing_steps", "50", "--seed", "714",
        "--unified_reward_url", "None",
        "--mesh_dp", "4", "--mesh_fsdp", "2",
    ])
    cfg = config_from_args(args)
    assert cfg.data.data_json_path == "/d"
    assert cfg.grpo.num_generations == 12
    assert cfg.grpo.flow_grpo_sampling is True
    assert cfg.window.prog_overlap is True
    assert cfg.dpm.dpm_algorithm_type == "dpmsolver++"
    assert cfg.reward.unified_reward_url is None  # "None" string -> None
    assert cfg.mesh.dp == 4 and cfg.mesh.fsdp == 2
    sc = cfg.sampler_config()
    assert sc.dpm_solver_order == 2 and sc.eta == 0.7


def test_cli_runtime_flags_and_config_round_trip():
    """TPU runtime knobs (attn impl, LoRA) reach the config from the CLI,
    and TrainConfig survives a JSON round-trip (args.json replay)."""
    import json

    from mixgrpo_tpu.config import (
        TrainConfig, build_arg_parser, config_from_args,
    )

    args = build_arg_parser().parse_args([
        "--attn_impl", "pallas", "--use_lora", "--lora_rank", "8",
        "--lora_alpha", "32", "--rollout_quant", "int8", "--no-use_group",
    ])
    cfg = config_from_args(args)
    assert cfg.runtime.attn_impl == "pallas"
    assert cfg.runtime.use_lora and cfg.runtime.lora_rank == 8
    assert cfg.runtime.lora_alpha == 32.0
    assert cfg.grpo.rollout_quant == "int8"
    assert cfg.grpo.use_group is False

    cfg2 = TrainConfig.from_dict(json.loads(cfg.to_json()))
    assert cfg2.runtime == cfg.runtime
    assert cfg2.grpo == cfg.grpo
    assert cfg2.mesh == cfg.mesh
    assert cfg2.window == cfg.window
