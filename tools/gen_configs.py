"""Generate the supported config matrix into kantts_tpu/configs/.

The reference ships 23 YAMLs (SURVEY.md §5.6); here they are composed
programmatically from base dicts + per-variant deltas, with the same
parameter values and schema so configs interoperate.

Run: python tools/gen_configs.py
"""

import copy
import os

import yaml

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "kantts_tpu", "configs")

# ------------------------------------------------------------------- audio

AUDIO_BASE = {
    "wav_normalize": True,
    "trim_silence": True,
    "trim_silence_threshold_db": 60,
    "preemphasize": False,
    "sampling_rate": 16000,
    "hop_length": 200,
    "win_length": 1000,
    "n_fft": 2048,
    "n_mels": 80,
    "fmin": 0.0,
    "fmax": 8000.0,
    "phone_level_feature": True,
    "norm_type": "mean_std",
    "max_norm": 1.0,
    "symmetric": False,
    "min_level_db": -100.0,
    "ref_level_db": 20,
    "num_workers": 16,
}

AUDIO_VARIANTS = {
    "audio_config_16k": {},
    "audio_config_8k": {"sampling_rate": 8000, "hop_length": 100,
                        "win_length": 600, "fmax": 4000.0},
    "audio_config_24k": {"sampling_rate": 24000, "hop_length": 240,
                         "win_length": 1024, "n_fft": 1024, "fmin": 50.0},
    "audio_config_48k": {"sampling_rate": 48000, "hop_length": 600,
                         "win_length": 2400, "n_fft": 4096, "n_mels": 128,
                         "fmax": 12000.0},
    "audio_config_se_16k": {"se_feature": True},
}

# ----------------------------------------------------------------- sambert

SAMBERT_PARAMS = {
    "max_len": 800,
    "embedding_dim": 512,
    "encoder_num_layers": 8,
    "encoder_num_heads": 8,
    "encoder_num_units": 128,
    "encoder_ffn_inner_dim": 1024,
    "encoder_dropout": 0.1,
    "encoder_attention_dropout": 0.1,
    "encoder_relu_dropout": 0.1,
    "encoder_projection_units": 32,
    "speaker_units": 32,
    "emotion_units": 32,
    "predictor_filter_size": 41,
    "predictor_fsmn_num_layers": 3,
    "predictor_num_memory_units": 128,
    "predictor_ffn_inner_dim": 256,
    "predictor_dropout": 0.1,
    "predictor_shift": 0,
    "predictor_lstm_units": 128,
    "dur_pred_prenet_units": [128, 128],
    "dur_pred_lstm_units": 128,
    "decoder_prenet_units": [256, 256],
    "decoder_num_layers": 12,
    "decoder_num_heads": 8,
    "decoder_num_units": 128,
    "decoder_ffn_inner_dim": 1024,
    "decoder_dropout": 0.1,
    "decoder_attention_dropout": 0.1,
    "decoder_relu_dropout": 0.1,
    "outputs_per_step": 3,
    "num_mels": 80,
    "postnet_filter_size": 41,
    "postnet_fsmn_num_layers": 4,
    "postnet_num_memory_units": 256,
    "postnet_ffn_inner_dim": 512,
    "postnet_dropout": 0.1,
    "postnet_shift": 17,
    "postnet_lstm_units": 128,
    "MAS": False,
}


def sambert_config(params_delta=None, ling_delta=None, loss_extra=None,
                   top_delta=None):
    cfg = {
        "model_type": "sambert",
        "Model": {
            "KanTtsSAMBERT": {
                "params": {**copy.deepcopy(SAMBERT_PARAMS), **(params_delta or {})},
                "optimizer": {
                    "type": "Adam",
                    "params": {"lr": 0.001, "betas": [0.9, 0.98],
                               "eps": 1.0e-9, "weight_decay": 0.0},
                },
                "scheduler": {"type": "NoamLR", "params": {"warmup_steps": 4000}},
            }
        },
        "linguistic_unit": {
            "cleaners": "english_cleaners",
            "lfeat_type_list": "sy,tone,syllable_flag,word_segment,"
                               "emo_category,speaker_category",
            "speaker_list": "F7",
            **(ling_delta or {}),
        },
        "Loss": {
            "MelReconLoss": {"enable": True, "params": {"loss_type": "mae"}},
            "ProsodyReconLoss": {"enable": True, "params": {"loss_type": "mae"}},
            **(loss_extra or {}),
        },
        "batch_size": 32,
        "allow_cache": True,
        "num_workers": 4,
        "grad_norm": 1.0,
        "train_max_steps": 1000000,
        "save_interval_steps": 20000,
        "eval_interval_steps": 10000,
        "log_interval_steps": 1000,
        "num_save_intermediate_results": 4,
    }
    cfg.update(top_delta or {})
    return cfg


MAS_LOSSES = {
    "AttentionCTCLoss": {"enable": True},
    "AttentionBinarizationLoss": {
        "enable": True, "params": {"start_epoch": 0, "warmup_epoch": 100}
    },
}

SAMBERT_VARIANTS = {
    "sambert_16k": sambert_config(),
    "sambert_24k": sambert_config(),
    "sambert_48k": sambert_config({"max_len": 900, "num_mels": 128}),
    "sambert_16k_MAS": sambert_config({"MAS": True}, loss_extra=MAS_LOSSES),
    "sambert_16k_MAS_byte": sambert_config(
        {"MAS": True, "using_byte": True},
        ling_delta={"lfeat_type_list": "byte_index,emo_category,speaker_category"},
        loss_extra=MAS_LOSSES,
        top_delta={"batch_size": 8},
    ),
    "sambert_nsf_16k": sambert_config(
        {"num_mels": 82, "NSF": True},
        ling_delta={"speaker_list": "F7,F74,FBYN,FRXL,M7,xiaoyu"},
        top_delta={"train_max_steps": 10000000, "eval_interval_steps": 2300500},
    ),
    "sambert_nsf_24k": sambert_config(
        {"num_mels": 82, "NSF": True},
        top_delta={"train_max_steps": 1000000},
    ),
    "sambert_se_nsf_global_16k": sambert_config(
        {"num_mels": 82, "NSF": True, "nsf_norm_type": "global",
         "nsf_f0_global_minimum": 30.0, "nsf_f0_global_maximum": 730.0,
         "SE": True, "speaker_units": 192},
        top_delta={"allow_cache": False, "train_max_steps": 1760101,
                   "save_interval_steps": 100,
                   "eval_interval_steps": 1000000000000,
                   "log_interval_steps": 10},
    ),
    "sambert_sichuan_16k": sambert_config(
        ling_delta={"speaker_list": "xiaoyue", "language": "Sichuan"},
    ),
    "sambert_fp_8k": sambert_config(
        {"FP": True},
        ling_delta={"speaker_list": "F7,F74,M7,FBYN,FRXL,xiaoyu"},
        loss_extra={"FpCELoss": {"enable": True,
                                 "params": {"loss_type": "ce",
                                            "weight": [1, 4, 4, 8]}}},
        top_delta={"batch_size": 16},
    ),
}

# ----------------------------------------------------------------- hifigan


def hifigan_config(gen_delta=None, mel_loss_delta=None, top_delta=None,
                   resblock_dilations=None):
    dil = resblock_dilations or [[1, 3, 5, 7]] * 3
    cfg = {
        "model_type": "hifigan",
        "Model": {
            "Generator": {
                "params": {
                    "in_channels": 80,
                    "out_channels": 1,
                    "channels": 256,
                    "kernel_size": 7,
                    "upsample_scales": [10, 5, 2, 2],
                    "upsample_kernal_sizes": [20, 10, 4, 4],
                    "resblock_kernel_sizes": [3, 7, 11],
                    "resblock_dilations": dil,
                    "bias": True,
                    "causal": True,
                    "nonlinear_activation": "LeakyReLU",
                    "nonlinear_activation_params": {"negative_slope": 0.1},
                    "use_weight_norm": True,
                    **(gen_delta or {}),
                },
                "optimizer": {
                    "type": "Adam",
                    "params": {"lr": 2.0e-4, "betas": [0.5, 0.9],
                               "weight_decay": 0.0},
                },
                "scheduler": {
                    "type": "MultiStepLR",
                    "params": {"gamma": 0.5,
                               "milestones": [200000, 400000, 600000, 800000]},
                },
            },
            "MultiScaleDiscriminator": {
                "params": {
                    "scales": 3,
                    "downsample_pooling": "DWT",
                    "downsample_pooling_params": {"kernel_size": 4, "stride": 2,
                                                  "padding": 2},
                    "discriminator_params": {
                        "in_channels": 1, "out_channels": 1,
                        "kernel_sizes": [15, 41, 5, 3], "channels": 128,
                        "max_downsample_channels": 1024, "max_groups": 16,
                        "bias": True, "downsample_scales": [4, 4, 4, 4, 1],
                        "nonlinear_activation": "LeakyReLU",
                        "nonlinear_activation_params": {"negative_slope": 0.1},
                    },
                    "follow_official_norm": True,
                },
                "optimizer": {
                    "type": "Adam",
                    "params": {"lr": 2.0e-4, "betas": [0.5, 0.9],
                               "weight_decay": 0.0},
                },
                "scheduler": {
                    "type": "MultiStepLR",
                    "params": {"gamma": 0.5,
                               "milestones": [200000, 400000, 600000, 800000]},
                },
            },
            "MultiPeriodDiscriminator": {
                "params": {
                    "periods": [2, 3, 5, 7, 11],
                    "discriminator_params": {
                        "in_channels": 1, "out_channels": 1,
                        "kernel_sizes": [5, 3], "channels": 32,
                        "downsample_scales": [3, 3, 3, 3, 1],
                        "max_downsample_channels": 1024, "bias": True,
                        "nonlinear_activation": "LeakyReLU",
                        "nonlinear_activation_params": {"negative_slope": 0.1},
                        "use_spectral_norm": False,
                    },
                },
                "optimizer": {
                    "type": "Adam",
                    "params": {"lr": 2.0e-4, "betas": [0.5, 0.9],
                               "weight_decay": 0.0},
                },
                "scheduler": {
                    "type": "MultiStepLR",
                    "params": {"gamma": 0.5,
                               "milestones": [200000, 400000, 600000, 800000]},
                },
            },
        },
        "Loss": {
            "generator_adv_loss": {
                "enable": True,
                "params": {"average_by_discriminators": False},
                "weights": 1.0,
            },
            "discriminator_adv_loss": {
                "enable": True,
                "params": {"average_by_discriminators": False},
                "weights": 1.0,
            },
            "stft_loss": {"enable": False},
            "mel_loss": {
                "enable": True,
                "params": {"fs": 16000, "fft_size": 2048, "hop_size": 200,
                           "win_length": 1000, "window": "hann",
                           "num_mels": 80, "fmin": 0, "fmax": 8000,
                           "log_base": None, **(mel_loss_delta or {})},
                "weights": 45.0,
            },
            "subband_stft_loss": {
                "enable": False,
                "params": {"fft_sizes": [384, 683, 171],
                           "hop_sizes": [35, 75, 15],
                           "win_lengths": [150, 300, 60],
                           "window": "hann_window"},
            },
            "feat_match_loss": {
                "enable": True,
                "params": {"average_by_discriminators": False,
                           "average_by_layers": False},
                "weights": 2.0,
            },
        },
        "batch_size": 16,
        "batch_max_steps": 9600,
        "allow_cache": True,
        "num_workers": 2,
        "generator_grad_norm": -1,
        "discriminator_grad_norm": -1,
        "generator_train_start_steps": 1,
        "discriminator_train_start_steps": 0,
        "train_max_steps": 2500000,
        "save_interval_steps": 20000,
        "eval_interval_steps": 10000,
        "log_interval_steps": 1000,
        "num_save_intermediate_results": 4,
    }
    cfg.update(top_delta or {})
    return cfg


HIFIGAN_VARIANTS = {
    "hifigan_v1_16k": hifigan_config(),
    "hifigan_v1_8k": hifigan_config(
        gen_delta={"upsample_scales": [5, 5, 2, 2],
                   "upsample_kernal_sizes": [10, 10, 4, 4]},
        mel_loss_delta={"fs": 8000, "fmax": 4000},
        top_delta={"batch_max_steps": 6000},
    ),
    "hifigan_v1_24k": hifigan_config(
        gen_delta={"channels": 512, "upsample_scales": [8, 5, 3, 2],
                   "upsample_kernal_sizes": [16, 10, 6, 4]},
        mel_loss_delta={"fs": 24000, "fft_size": 1024, "hop_size": 240,
                        "win_length": 1024, "fmin": 50, "fmax": 12000},
    ),
    "hifigan_v1_48k": hifigan_config(
        gen_delta={"in_channels": 128, "channels": 512,
                   "upsample_scales": [10, 5, 3, 2, 2],
                   "upsample_kernal_sizes": [20, 10, 6, 4, 4]},
        mel_loss_delta={"fs": 48000, "fft_size": 4096, "hop_size": 600,
                        "win_length": 2400, "num_mels": 128, "fmax": 12000},
        top_delta={"batch_max_steps": 19200},
    ),
    "hifigan_v1_nsf_24k": hifigan_config(
        gen_delta={"channels": 512, "upsample_scales": [8, 5, 3, 2],
                   "upsample_kernal_sizes": [16, 10, 6, 4],
                   "nsf_params": {"nb_harmonics": 7, "sampling_rate": 24000}},
        mel_loss_delta={"fs": 24000, "fft_size": 1024, "hop_size": 240,
                        "win_length": 1024, "fmin": 50, "fmax": 12000},
        resblock_dilations=[[1, 3, 5]] * 3,
    ),
    "hifigan_noncausal_v1_16k": hifigan_config(
        gen_delta={"causal": False, "upsample_kernal_sizes": [20, 11, 4, 4]},
    ),
    "hifigan_noncausal_nsf_v1_16k": hifigan_config(
        gen_delta={"causal": False, "upsample_kernal_sizes": [20, 11, 4, 4],
                   "nsf_params": {"nb_harmonics": 7, "sampling_rate": 16000}},
        top_delta={"allow_cache": False},
    ),
    "hifigan_noncausal_nsf_global_v1_16k": hifigan_config(
        gen_delta={"causal": False, "upsample_kernal_sizes": [20, 11, 4, 4],
                   "nsf_params": {"nb_harmonics": 7, "sampling_rate": 16000,
                                  "nsf_norm_type": "global",
                                  "nsf_f0_global_minimum": 30.0,
                                  "nsf_f0_global_maximum": 730.0}},
        top_delta={"allow_cache": False},
    ),
}

# ------------------------------------------------------------------ sybert

SYBERT = {
    "model_type": "sybert",
    "Model": {
        "KanTtsTextsyBERT": {
            "params": {
                "max_len": 800,
                "embedding_dim": 512,
                "encoder_num_layers": 8,
                "encoder_num_heads": 8,
                "encoder_num_units": 128,
                "encoder_ffn_inner_dim": 1024,
                "encoder_dropout": 0.1,
                "encoder_attention_dropout": 0.1,
                "encoder_relu_dropout": 0.1,
                "encoder_projection_units": 32,
                "mask_ratio": 0.3,
            },
            "optimizer": {
                "type": "Adam",
                "params": {"lr": 0.0001, "betas": [0.9, 0.98], "eps": 1.0e-9,
                           "weight_decay": 0.0},
            },
            "scheduler": {"type": "NoamLR", "params": {"warmup_steps": 10000}},
        }
    },
    "linguistic_unit": {
        "cleaners": "english_cleaners",
        "lfeat_type_list": "sy,tone,syllable_flag,word_segment,"
                           "emo_category,speaker_category",
        "speaker_list": "F7",
    },
    "Loss": {"SeqCELoss": {"enable": True, "params": {"loss_type": "ce"}}},
    "batch_size": 32,
    "allow_cache": True,
    "num_workers": 4,
    "grad_norm": 1.0,
    "train_max_steps": 1000000,
    "save_interval_steps": 20000,
    "eval_interval_steps": 10000,
    "log_interval_steps": 1000,
    "num_save_intermediate_results": 4,
}


def main():
    os.makedirs(OUT, exist_ok=True)
    wrote = 0
    for name, delta in AUDIO_VARIANTS.items():
        cfg = {"audio_config": {**copy.deepcopy(AUDIO_BASE), **delta}}
        with open(os.path.join(OUT, name + ".yaml"), "w") as f:
            yaml.safe_dump(cfg, f, sort_keys=False)
        wrote += 1
    for name, cfg in {**SAMBERT_VARIANTS, **HIFIGAN_VARIANTS,
                      "sybert": SYBERT}.items():
        with open(os.path.join(OUT, name + ".yaml"), "w") as f:
            yaml.safe_dump(cfg, f, sort_keys=False)
        wrote += 1
    print(f"wrote {wrote} configs to {OUT}")


if __name__ == "__main__":
    main()
