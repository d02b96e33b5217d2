PreprocessDataset = None
Preprocessor = None
SphericalDataset = None
