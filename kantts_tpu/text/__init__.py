from kantts_tpu.text.ling_unit import KanTtsLinguisticUnit, get_fpdict  # noqa: F401
