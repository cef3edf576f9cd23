from cuda_flash_attention_tpu.bench.configs import (  # noqa: F401
    TestConfig,
    create_test_configs,
    create_experiment_configs,
    create_sequence_length_experiment_configs,
)
from cuda_flash_attention_tpu.bench.harness import Harness, TestResult  # noqa: F401
