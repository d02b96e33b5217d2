def sample_attachment(*a, **k):
    raise NotImplementedError
def sample_height(*a, **k):
    raise NotImplementedError
