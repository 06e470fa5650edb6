from .raw_bronze import RawBronzeConfig, run_raw_bronze  # noqa: F401
from .bronze_silver import BronzeSilverConfig, run_bronze_silver  # noqa: F401
