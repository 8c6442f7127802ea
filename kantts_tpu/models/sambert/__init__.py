from kantts_tpu.models.sambert.sambert import KanTtsSAMBERT, KanTtsTextsyBERT  # noqa: F401
