from .knn import knn, nn
