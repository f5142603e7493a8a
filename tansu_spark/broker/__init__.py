from tansu_spark.broker.broker import Broker, TopicConfig

__all__ = ["Broker", "TopicConfig"]
