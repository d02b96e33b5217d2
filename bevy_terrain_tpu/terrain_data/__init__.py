"""Terrain data layer (L1): TileTree + TileAtlas (placeholder, filled next)."""
TileAtlas = None
TileTree = None
