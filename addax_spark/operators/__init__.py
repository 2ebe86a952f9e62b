"""Operator library: every op is a pure function DataFrame -> DataFrame
(the Spark-native analog of the reference's Reader/Transformer/Writer task
chain, core/.../transport/exchanger/TransformerExchanger.java:65-138)."""
