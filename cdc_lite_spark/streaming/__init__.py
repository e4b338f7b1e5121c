from cdc_lite_spark.streaming.monitor import start_monitor

__all__ = ["start_monitor"]
