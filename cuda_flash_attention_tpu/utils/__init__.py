from cuda_flash_attention_tpu.utils.io import (  # noqa: F401
    load_binary_file,
    save_binary_file,
    parse_config_string,
    data_dir_name,
)
from cuda_flash_attention_tpu.utils.timing import Timer, benchmark  # noqa: F401
