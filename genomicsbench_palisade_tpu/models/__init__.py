"""NN inference models (flax): bonito basecaller, clair variant caller."""
