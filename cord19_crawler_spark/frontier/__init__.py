from .scheduler import CrawlScheduler, SchedulerConfig  # noqa: F401
