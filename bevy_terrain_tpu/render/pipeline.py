Terrain = None
TerrainFrameOutput = None
