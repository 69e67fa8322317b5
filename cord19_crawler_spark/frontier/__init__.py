from .fetch import make_udf_fetcher  # noqa: F401
from .psl import load_psl, with_registrable_domain  # noqa: F401
from .scheduler import CrawlScheduler, SchedulerConfig  # noqa: F401
