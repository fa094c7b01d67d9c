"""L3-L5: tensor-train containers, TCI1/TCI2 algorithms, conversions, global
search, contraction and integration."""
