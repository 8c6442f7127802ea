from kantts_tpu.data.dataset import (  # noqa: F401
    AMDataset,
    BERTTextDataset,
    DataLoader,
    DistributedSampler,
    Padder,
    VocDataset,
    beta_binomial_prior_distribution,
    get_am_datasets,
    get_bert_text_datasets,
    get_voc_datasets,
)
