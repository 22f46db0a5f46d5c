from ldagibbssampling_tpu.utils.javarandom import JavaRandom

__all__ = ["JavaRandom"]
